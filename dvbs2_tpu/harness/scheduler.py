"""Automatic pipeline scheduling analogue — Scheduler_OTAC/GR (reference:
src/mains/RX/main_sched.cpp:267-360).

The reference profiles every task over P executions, then solves for a
decomposition of the task chain into pipeline stages over R resources
(threads), maximizing throughput, and instantiates that pipeline.  Under XLA
the whole chain compiles into ONE fused program, so the pipeline itself is
not materialized — but the capability (profile -> optimal decomposition ->
predicted vs fused-measured throughput) is reproduced:

  * ``profile``     — time each chain stage separately (jitted, reps
                      executions), like Scheduler::profile.
  * ``solve``       — exact DP for the optimal contiguous partition of the
                      chain into <= R resource-allocated stages minimizing
                      the bottleneck  max_j T_j / r_j  s.t. sum r_j <= R
                      (the OTAC objective: pipeline throughput = 1/bottleneck).
  * ``show``        — aff3ct-style solution table with the predicted
                      pipeline throughput next to the measured fused-XLA
                      throughput (which needs no pipeline at all — the
                      point of the comparison).
"""
from __future__ import annotations

import time
from typing import Callable, List, Sequence, Tuple

import jax
import numpy as np


def _salted(val, r: int):
    """Vary the input per rep (roll the first array leaf) so backends that
    memoize (executable, inputs) pairs — e.g. the tunneled TPU — actually
    execute every rep instead of replaying a cached result."""
    leaves, treedef = jax.tree_util.tree_flatten(val)
    if leaves and getattr(leaves[0], "ndim", 0) > 0:
        leaves = [jax.numpy.roll(leaves[0], r, axis=-1)] + leaves[1:]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def profile(stages: Sequence[Tuple[str, str, Callable, object]],
            reps: int = 8) -> List[Tuple[str, float]]:
    """Time each (module, task, fn, input) stage over ``reps`` executions,
    salting the input and fetching a scalar of the result every rep (see
    bench.py's tunnel methodology)."""
    out = []
    for (mod, task, fn, val) in stages:
        f = jax.jit(fn)
        jax.block_until_ready(f(val))
        np.asarray(jax.tree_util.tree_leaves(f(val))[0]).ravel()[:1]
        t0 = time.perf_counter()
        for r in range(reps):
            res = f(_salted(val, 1 + r))
            np.asarray(jax.tree_util.tree_leaves(res)[0]).ravel()[:1]
        out.append((f"{mod}::{task}",
                    (time.perf_counter() - t0) / reps))
    return out


def solve(times: Sequence[float], R: int):
    """Optimal contiguous partition + integer resource allocation.

    Returns (bottleneck_seconds, [(start, end_exclusive, resources), ...]).
    Exact DP: dp[i][r] = best bottleneck for stages[:i] with r resources.
    """
    n = len(times)
    R = max(1, min(R, 4 * n))
    pre = np.concatenate([[0.0], np.cumsum(times)])
    INF = float("inf")
    dp = np.full((n + 1, R + 1), INF)
    choice = {}
    dp[0, :] = 0.0
    for i in range(1, n + 1):
        for r in range(1, R + 1):
            for j in range(i):
                T = pre[i] - pre[j]
                for rho in range(1, r - (0 if j == 0 else 1) + 1):
                    prev = dp[j, r - rho]
                    if prev == INF:
                        continue
                    b = max(prev, T / rho)
                    if b < dp[i, r]:
                        dp[i, r] = b
                        choice[(i, r)] = (j, rho)
    r_best = int(np.argmin(dp[n, 1:]) + 1)
    groups = []
    i, r = n, r_best
    while i > 0:
        j, rho = choice[(i, r)]
        groups.append((j, i, rho))
        i, r = j, r - rho
    return float(dp[n, r_best]), groups[::-1]


def show(named_times: List[Tuple[str, float]], R: int,
         fused_thr_fps: float = None, frames_per_call: int = 1,
         out=print) -> float:
    """Print the scheduling solution; returns predicted pipeline frames/s."""
    times = [t for (_n, t) in named_times]
    bottleneck, groups = solve(times, R)
    pred_fps = frames_per_call / bottleneck
    out(f"# Scheduler solution (OTAC-style DP, R={R} resources, "
        f"{len(groups)} stages):")
    out("# -------|----------|-----------|-------------------------------")
    out("#  STAGE | RESOURCES| TIME (us) | TASKS")
    out("# -------|----------|-----------|-------------------------------")
    for s, (j, i, rho) in enumerate(groups):
        T = sum(times[j:i])
        names = ", ".join(n for (n, _t) in named_times[j:i])
        out(f"# {s:6d} | {rho:8d} | {T*1e6:9.1f} | {names}")
    out("# -------|----------|-----------|-------------------------------")
    out(f"# predicted pipeline throughput: {pred_fps:.1f} frames/s "
        f"(bottleneck {bottleneck*1e6:.1f} us)")
    if fused_thr_fps is not None:
        out(f"# measured fused-XLA throughput (no pipeline): "
            f"{fused_thr_fps:.1f} frames/s")
    return pred_fps
