#!/usr/bin/env python
"""Tune the full-chain bench geometry: steady-state NMS-10 throughput
after acquisition for several (B, F, hold) combinations."""
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

key = jax.random.key(time.time_ns() % (2 ** 31))

for B, F, hold in ((128, 64, 404), (128, 32, 808)):
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
                 chn_max_freq_shift=0.05, chn_max_delay=4.5,
                 stm_hold_size=hold)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    st = txrx.txrx_init(cfg, B)
    st = txrx.acquire(jax.random.fold_in(key, B * hold), sigma, cfg, st, B,
                      max_waiting=64, learn12=48, learn3=48)
    step = txrx.jit_step(cfg, B, F)
    r = step(jax.random.fold_in(key, 1), sigma, st)
    int(r.fe)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        r = step(jax.random.fold_in(key, 2 + i), sigma, st)
        st2 = r.state
        int(r.fe)
        best = min(best, time.perf_counter() - t0)
    mbps = B * F * cfg.K_bch / best / 1e6
    print(f"B={B} F={F} hold={hold}: {best*1e3:.0f} ms/step -> "
          f"{mbps:.1f} Mb/s (fe={int(r.fe)}/{int(r.n_frames)})", flush=True)
