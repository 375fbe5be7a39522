#!/usr/bin/env python
"""Quick TPU probe: full-chain txrx_step time with ULTRA (blocked Gardner)
vs FAST (exact per-sample scan). Timing via differenced scan windows
(see bench.py docstring for the tunnel methodology)."""
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

B = int(os.environ.get("PROBE_B", "32"))
F = int(os.environ.get("PROBE_F", "8"))
MODES = os.environ.get("PROBE_MODES", "ULTRA,FAST").split(",")

salt = time.time_ns() % (2 ** 31)
for stm in MODES:
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
                 chn_max_freq_shift=0.05, chn_max_delay=4.5, stm_type=stm)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    state0 = txrx.txrx_init(cfg, B)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n_steps, key, st):
        def body(carry, i):
            be, fe, s = carry
            r = txrx.txrx_step(jax.random.fold_in(key, i), sigma, cfg, s,
                               B, F)
            return (be + r.be, fe + r.fe, r.state), None
        (be, fe, st2), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0), st), jnp.arange(n_steps))
        return be, fe

    key = jax.random.key(salt)
    t0 = time.perf_counter()
    int(run(1, key, state0)[0])
    print(f"{stm}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    int(run(3, key, state0)[0])
    best = float("inf")
    for w in range(3):
        kw = jax.random.fold_in(key, 100 + w)
        t0 = time.perf_counter(); int(run(1, kw, state0)[0])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(3, kw, state0)[0])
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / 2)
    mbps = B * F * cfg.K_bch / best / 1e6
    print(f"{stm}: step {best * 1e3:.1f} ms -> {mbps:.2f} Mb/s "
          f"(B={B}, F={F})", flush=True)
