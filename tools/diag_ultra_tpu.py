#!/usr/bin/env python
"""TPU-instrumented reproduction of the ULTRA delay-4.0 FER floor.

Replicates tools/parity_full.py's 000_40 measurement (real acquisition,
F frames/step, traced dyn) at a single Eb/N0 with per-frame error /
delay / flag / underflow outputs, to characterize the floor events:
are frame errors bursty? do they coincide with frame-sync delay changes,
flag drops, or underflows?

Usage: python tools/diag_ultra_tpu.py [ULTRA|FAST] [steps]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx
from dvbs2_tpu.chains.rx import rx_frames

STM = sys.argv[1] if len(sys.argv) > 1 else "ULTRA"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 150
B = int(os.environ.get("DIAG_B", "32"))
F = int(os.environ.get("DIAG_F", "8"))
EBN0 = float(os.environ.get("DIAG_EBN0", "4.0"))
DEC = os.environ.get("DIAG_DEC", "NMS")
NITE = int(os.environ.get("DIAG_NITE", "10"))

HOLD = int(os.environ.get("DIAG_HOLD", "101"))
DELAY = float(os.environ.get("DIAG_DELAY", "4.0"))

cfg = Config(modcod="QPSK-S_8/9", ldpc_implem=DEC, ldpc_nite=NITE,
             chn_max_freq_shift=0.0, chn_max_delay=DELAY, stm_type=STM,
             stm_hold_size=HOLD)
dyn = (jnp.float32(0.0), jnp.float32(DELAY - int(DELAY)))
sigma = jnp.full((B,), cfg.ebn0_to_sigma(EBN0), jnp.float32)


@jax.jit
def probe_step(key, state):
    """txrx_step body with per-frame extras exposed."""
    depth = txrx.bits_depth(cfg)
    bits, y, tx_state, ch_state = txrx._tx_and_channel(
        key, sigma, cfg, state, B, F, dyn=dyn)
    dec, info, rx_state = rx_frames(y, sigma, cfg, state.rx, F)
    cat = jnp.concatenate([state.prev_bits, bits], axis=1)
    idx = depth + jnp.arange(F)[None, :] - state.slips[:, None]
    ref = cat[jnp.arange(B)[:, None], jnp.clip(idx, 0, depth + F - 1)]
    errs = jnp.sum(dec != ref, axis=-1)                   # (B, F)
    uf = info["underflow"]
    new_state = txrx.TxRxState(
        tx=tx_state, ch=ch_state, rx=rx_state, prev_bits=cat[:, F:],
        frame_count=state.frame_count + F, slips=state.slips + uf * F)
    return new_state, (errs, info["delay"], info["flag"], uf,
                       rx_state.extract.count, rx_state.gardner.mu,
                       rx_state.gardner.nco)


def main():
    key = jax.random.key(int(os.environ.get("DIAG_SEED", "21")))
    state = txrx.txrx_init(cfg, B)
    t0 = time.perf_counter()
    state = txrx.acquire(jax.random.fold_in(key, 0xACE), sigma, cfg, state,
                         B, dyn=dyn)
    print(f"# acquired in {time.perf_counter() - t0:.0f}s; "
          f"carry={np.asarray(state.rx.extract.count)[:8]}... "
          f"mu={np.asarray(state.rx.gardner.mu)[:8].round(3)}...",
          flush=True)

    fe_tot = np.zeros(B, np.int64)
    n_tot = 0
    delay_prev = None
    t0 = time.perf_counter()
    for s in range(STEPS):
        state, out = probe_step(jax.random.fold_in(key, 1 + s), state)
        errs, delay, flag, uf, carry, mu, nco = (np.asarray(o) for o in out)
        bad = errs > 0
        if s >= 2:            # skip warmup steps
            fe_tot += bad.sum(1)
            n_tot += F
        dchg = (np.diff(np.concatenate(
            [delay_prev[:, None], delay], axis=1), axis=1) != 0).any(1) \
            if delay_prev is not None else np.zeros(B, bool)
        interesting = bad.any() or uf.any() or (~flag).any() or dchg.any()
        if interesting and s >= 2:
            for b in np.nonzero(bad.any(1) | uf.astype(bool) | dchg)[0][:6]:
                print(f"step {s:3d} strm {b:2d}: errs={errs[b].tolist()} "
                      f"delay={delay[b].tolist()} flag={flag[b].tolist()} "
                      f"uf={uf[b]} carry={carry[b]} mu={mu[b]:.3f} "
                      f"nco={nco[b]:.3f}", flush=True)
        delay_prev = delay[:, -1:].copy()[:, 0]
    dt = time.perf_counter() - t0
    fer = fe_tot.sum() / (n_tot * B)
    print(f"## {STM}: {n_tot * B} frames, fe={fe_tot.sum()} "
          f"FER={fer:.3e} per-stream fe={fe_tot.tolist()} "
          f"({n_tot * B * cfg.K_bch / dt / 1e6:.1f} Mb/s)")


if __name__ == "__main__":
    main()
