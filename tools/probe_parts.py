#!/usr/bin/env python
"""TPU timing breakdown: blocked Gardner scan alone (several hold sizes),
full step with genie timing (scan removed), and the ULTRA step."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx
from dvbs2_tpu.ops import sync

B = int(os.environ.get("PROBE_B", "32"))
F = int(os.environ.get("PROBE_F", "8"))
N = 16740 * F
salt = time.time_ns() % (2 ** 31)
key = jax.random.key(salt)


def timed(fn, *args, reps=4):
    r = fn(*args)
    float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    best = float("inf")
    for i in range(reps):
        a = [jnp.asarray(x) * (1.0 + 1e-9 * (i + 1)) if hasattr(x, "dtype")
             and jnp.issubdtype(x.dtype, jnp.floating) else x for x in args]
        t0 = time.perf_counter()
        r = fn(*a)
        float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


x = jax.random.normal(key, (B, N, 2), jnp.float32) * 0.1

for hold in (101, 202, 404):
    cfg = Config(stm_hold_size=hold)
    f = jax.jit(lambda x: sync.gardner_scan_blocked(x, cfg)[0])
    H = sync._pick_hold(N, hold)
    dt = timed(f, x)
    print(f"blocked scan hold={hold} (H={H}, nblk={N // H}): "
          f"{dt * 1e3:.1f} ms ({dt / (N // H) * 1e6:.1f} us/blk)", flush=True)

for tag, kw in (("perfect", dict(perfect_sync=True)),
                ("ultra", dict(stm_type="ULTRA"))):
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
                 chn_max_freq_shift=0.0 if tag == "perfect" else 0.05,
                 chn_max_delay=4.5, **kw)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    state0 = txrx.txrx_init(cfg, B)

    @jax.jit
    def step(key, st):
        r = txrx.txrx_step(key, sigma, cfg, st, B, F)
        return r.be, r.state

    r = step(key, state0)
    int(r[0])
    best = float("inf")
    for i in range(4):
        kw2 = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        rr = step(kw2, state0)
        int(rr[0])
        best = min(best, time.perf_counter() - t0)
    print(f"txrx_step[{tag}]: {best * 1e3:.1f} ms -> "
          f"{B * F * cfg.K_bch / best / 1e6:.1f} Mb/s", flush=True)
