#!/usr/bin/env python
"""Full-sync-chain ULTRA-vs-FAST diagnostic at the mu wrap boundary.

Drives rx_frames (decode=False) in tracking mode at an integer-sample
channel delay (locked mu ~ 0/1) for both stm types on IDENTICAL channel
streams, recording per step: timing-sync underflows, the frame-sync delay
estimate, lock flags and the extract carry level.  The hypothesis under
test (tools/diag_ultra_wrap.py showed the blocked Gardner itself never
slips symbol identity): the ~2e-2 ULTRA FER floor at delay-4.0 comes from
the extract carry sitting at a level where ULTRA's transient +-1
strobe-count jitter pattern triggers spurious underflows / frame-sync
realignments that FAST's pattern does not.

Usage: JAX_PLATFORMS=cpu python tools/diag_ultra_chain.py [carry0] [steps]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains.tx import tx_stream, TxState
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.chains.rx import rx_frames, rx_init
from dvbs2_tpu.ops import filters, sync

CARRY0 = int(sys.argv[1]) if len(sys.argv) > 1 else -1   # -1 = leave as-is
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 120
B = int(os.environ.get("DIAG_B", "4"))
F = 2
EBN0 = float(os.environ.get("DIAG_EBN0", "4.0"))
WARM_FRAMES = 30


def run(stm_type: str):
    cfg = Config(modcod="QPSK-S_8/9", chn_max_delay=4.0, stm_type=stm_type)
    sigma = jnp.float32(cfg.ebn0_to_sigma(EBN0))
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    L = cfg.pl_frame_size

    @jax.jit
    def produce(key, tx_st, ch_st):
        kb, kn = jax.random.split(key)
        bits = jax.random.bernoulli(kb, 0.5,
                                    (B, F, cfg.K_bch)).astype(jnp.int8)
        x, tx_st = tx_stream(bits, cfg, tx_st)
        y, ch_st = channel_chain.apply(kn, x, sigma, cfg, ch_st)
        return y, tx_st, ch_st

    @jax.jit
    def warm(y, rx):
        _d, info, rx = rx_frames(y, sigma, cfg, rx, F, decode=False,
                                 act=False)
        return info, rx

    @jax.jit
    def track(y, rx):
        _d, info, rx = rx_frames(y, sigma, cfg, rx, F, decode=False,
                                 act=True)
        return info, rx

    n_hist = (len(taps) + cfg.shp_osf - 1) // cfg.shp_osf
    tx_st = TxState(shp=jnp.zeros((B, n_hist, 2), jnp.float32))
    ch_st = channel_chain.init_state(cfg, B)
    rx = rx_init(cfg, B)
    key = jax.random.key(int(os.environ.get("DIAG_SEED", "11")))

    for i in range(WARM_FRAMES // F):
        y, tx_st, ch_st = produce(jax.random.fold_in(key, i), tx_st, ch_st)
        info, rx = warm(y, rx)
    if CARRY0 >= 0:
        # force the extract carry to a chosen level by dropping/keeping
        # buffered symbols (shifts alignment by a fixed amount — the frame
        # sync re-locks during the extra warmup below)
        cnt = rx.extract.count
        drop = cnt - CARRY0
        buf = rx.extract.buf
        cap = buf.shape[1]
        brow = jnp.arange(B)[:, None]
        idx = jnp.clip(drop[:, None] + jnp.arange(cap)[None, :], 0, cap - 1)
        nbuf = jnp.stack([buf[..., 0][brow, idx], buf[..., 1][brow, idx]],
                         axis=-1)
        mask = (jnp.arange(cap)[None, :] <
                jnp.maximum(cnt - drop, 0)[:, None])[..., None]
        rx = rx._replace(extract=sync.ExtractState(
            buf=jnp.where(mask, nbuf, 0.0),
            count=jnp.maximum(cnt - drop, 0).astype(jnp.int32)))
        for i in range(40 // F):
            y, tx_st, ch_st = produce(jax.random.fold_in(key, 500 + i),
                                      tx_st, ch_st)
            info, rx = warm(y, rx)

    print(f"## {stm_type}: warm done. carry={np.asarray(rx.extract.count)} "
          f"mu={np.asarray(rx.gardner.mu).round(3)} "
          f"delay={np.asarray(info['delay'])[:, -1]} "
          f"flag={np.asarray(info['flag'])[:, -1]}")

    uf_total = np.zeros(B, np.int64)
    delay_prev = np.asarray(info["delay"])[:, -1].copy()
    events = 0
    for s in range(STEPS):
        y, tx_st, ch_st = produce(jax.random.fold_in(key, 10000 + s),
                                  tx_st, ch_st)
        info, rx = track(y, rx)
        uf = np.asarray(info["underflow"])
        dl = np.asarray(info["delay"])
        fl = np.asarray(info["flag"])
        uf_total += uf
        if uf.any() or (dl[:, -1] != delay_prev).any() or not fl.all():
            events += 1
            if events < 30:
                print(f"step {s:3d}: uf={uf} delay={dl.tolist()} "
                      f"flag_all={fl.all(1)} "
                      f"carry={np.asarray(rx.extract.count)} "
                      f"mu={np.asarray(rx.gardner.mu).round(3)} "
                      f"nco={np.asarray(rx.gardner.nco).round(3)}")
        delay_prev = dl[:, -1].copy()
    print(f"## {stm_type}: {STEPS} steps, uf_total={uf_total}, "
          f"event_steps={events}, final carry="
          f"{np.asarray(rx.extract.count)}")


if __name__ == "__main__":
    for stm in os.environ.get("DIAG_MODES", "ULTRA,FAST").split(","):
        run(stm)
