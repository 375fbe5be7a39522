#!/usr/bin/env python
"""Finer TPU breakdown of the full-chain step at several batch sizes:
tx+channel alone, rx front-end (sync, no decode), decode-only, whole step."""
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
from dvbs2_tpu.chains.rx import rx_frames, rx_init

F = int(os.environ.get("PROBE_F", "8"))
salt = time.time_ns() % (2 ** 31)
key = jax.random.key(salt)

cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
             chn_max_freq_shift=0.05, chn_max_delay=4.5, stm_type="ULTRA",
             stm_hold_size=404)


def timed(fn, fetch, reps=3):
    fetch(fn(0))
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        fetch(fn(i))
        best = min(best, time.perf_counter() - t0)
    return best


for B in (int(v) for v in os.environ.get("PROBE_BS", "32,128").split(",")):
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    state0 = txrx.txrx_init(cfg, B)
    N = F * cfg.pl_frame_size * cfg.shp_osf

    txch = jax.jit(lambda k: txrx._tx_and_channel(
        jax.random.fold_in(key, k), sigma, cfg, state0, B, F)[1])
    t_txch = timed(txch, lambda y: float(y.ravel()[0]))

    y0 = txch(999)
    sync_only = jax.jit(lambda y: rx_frames(
        y, sigma, cfg, state0.rx, F, decode=False)[1]["underflow"])
    t_sync = timed(lambda i: sync_only(y0 * (1.0 + 1e-9 * i)),
                   lambda r: int(r.ravel()[0]))

    full_rx = jax.jit(lambda y: rx_frames(
        y, sigma, cfg, state0.rx, F, decode=True)[0])
    t_rx = timed(lambda i: full_rx(y0 * (1.0 + 1e-9 * i)),
                 lambda r: int(r.ravel()[0]))

    step = jax.jit(lambda k: txrx.txrx_step(
        jax.random.fold_in(key, k), sigma, cfg, state0, B, F).be)
    t_step = timed(step, lambda r: int(r))
    mbps = B * F * cfg.K_bch / t_step / 1e6
    print(f"B={B}: tx+ch {t_txch*1e3:.0f} ms | rx-sync {t_sync*1e3:.0f} ms "
          f"| rx-full {t_rx*1e3:.0f} ms (decode {((t_rx-t_sync))*1e3:.0f}) "
          f"| step {t_step*1e3:.0f} ms -> {mbps:.1f} Mb/s", flush=True)
