#!/usr/bin/env python
"""Stage-level TPU breakdown of the full-chain RX front-end at the bench
geometry, to target the round-4 fusion work (VERDICT #5: 26 -> >=60 Mb/s).

Isolates: coarse mix | AGC | matched filter | blocked Gardner | extract |
per-frame stages (frame sync + descramble + L&R + fine) | decode; plus a
hold-size sweep for the blocked Gardner.
"""
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
from dvbs2_tpu.chains.rx import rx_frames
from dvbs2_tpu.ops import filters, sync, scrambler

B = int(os.environ.get("PROBE_B", "128"))
F = int(os.environ.get("PROBE_F", "32"))
HOLD = int(os.environ.get("PROBE_HOLD", "404"))
salt = time.time_ns() % (2 ** 31)
key = jax.random.key(salt)

FUSE = os.environ.get("DVBS2_FUSE", "auto")
cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
             chn_max_freq_shift=0.05, chn_max_delay=4.5, stm_type="ULTRA",
             stm_hold_size=HOLD, fused_frontend=FUSE)
sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
L = cfg.pl_frame_size
N = F * L * cfg.shp_osf
taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
state0 = txrx.txrx_init(cfg, B)


def timed(fn, *args, reps=3):
    """Median-of-reps op time via salted-input repeats + scalar fetch."""
    out = fn(*args)
    jax.tree.leaves(out)[0].ravel()[0].block_until_ready()
    float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for i in range(reps):
        a2 = [a * (1.0 + 1e-9 * (i + 1)) if hasattr(a, "dtype")
              and a.dtype == jnp.float32 and a.ndim >= 2 else a
              for a in args]
        t0 = time.perf_counter()
        out = fn(*a2)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # realistic input: one tx+channel block
    y0 = jax.jit(lambda k: txrx._tx_and_channel(
        k, sigma, cfg, state0, B, F)[1])(key)

    rx = state0.rx
    if FUSE != "never":
        from dvbs2_tpu.ops import frontend_pallas
        fe = jax.jit(lambda y: frontend_pallas.frontend(
            y, cfg, rx.coarse, rx.mf, rx.gardner)[0])
        t_mix = t_agc = t_mf = 0.0
        t_grd = timed(fe, y0)
        yg, sg = jax.jit(lambda y: frontend_pallas.frontend(
            y, cfg, rx.coarse, rx.mf, rx.gardner)[:2])(y0)
    else:
        mix = jax.jit(lambda y: sync.coarse_mix(y, rx.coarse)[0])
        agc = jax.jit(lambda y: filters.agc(y, output_energy=0.5))
        mf = jax.jit(lambda y: filters.fir(y, taps, rx.mf)[0])
        grd = jax.jit(lambda y: sync.gardner_scan_blocked(
            y, cfg, rx.gardner)[0])
        t_mix = timed(mix, y0)
        t_agc = timed(agc, y0)
        t_mf = timed(mf, y0)
        t_grd = timed(grd, y0)
        yg, sg, _ = jax.jit(lambda y: sync.gardner_scan_blocked(
            y, cfg, rx.gardner))(y0)
    ext = jax.jit(lambda y, s: sync.extract_strobed(
        y, s, F * L, rx.extract)[0])
    t_ext = timed(ext, yg, sg)

    syms = ext(yg, sg).reshape(B, F, L, 2)

    def frames_only(s):
        def per_frame(carry, frame):
            fs, lr = carry
            aligned, delay, flag, metric, fs = sync.frame_sync(frame, cfg, fs)
            descr = scrambler.pl_scramble(aligned, descramble=True)
            derot, f_lr, lr = sync.lr_fine_freq(descr, cfg, lr)
            fine, _f, _p = sync.phase_freq_fine(derot, cfg)
            return (fs, lr), fine
        (_fs, _lr), fine = jax.lax.scan(
            per_frame, (rx.fsync, rx.lr), s.transpose(1, 0, 2, 3))
        return fine
    frm = jax.jit(frames_only)
    t_frm = timed(frm, syms)

    fine = frm(syms).transpose(1, 0, 2, 3).reshape(B * F, L, 2)

    def decode_only(x):
        from dvbs2_tpu.ops import bch, estimator, framer, interleaver, ldpc
        from dvbs2_tpu.ops import modem, scrambler as scr
        xfec = framer.deframe(x, cfg.modcod)
        sg_ = estimator.estimate_sigma(xfec)
        llr = modem.demodulate(xfec, sg_, cfg.mod)
        llr = interleaver.deinterleave(llr, cfg.itl_n_cols, cfg.read_order)
        post = ldpc.decode(llr, cfg.ldpc_code, n_ite=cfg.ldpc_nite,
                           implem=cfg.ldpc_implem,
                           norm_factor=cfg.ldpc_norm_factor,
                           syndrome_exit=cfg.ldpc_syndrome_exit)
        hard = ldpc.hard_decision(post)[:, :cfg.N_bch]
        info_bits, _ok = bch.decode(hard, cfg.K_bch)
        return scr.bb_scramble(info_bits)
    dec = jax.jit(decode_only)
    t_dec = timed(dec, fine)

    step = jax.jit(lambda k, st: txrx.txrx_step(k, sigma, cfg, st, B, F))
    t_step = timed(lambda k: step(k, state0).be, key)
    mbps = B * F * cfg.K_bch / t_step / 1e6
    tot = t_mix + t_agc + t_mf + t_grd + t_ext + t_frm + t_dec
    print(f"B={B} F={F} hold={HOLD} (N={N}, {N // sync._pick_hold(N, HOLD)}"
          f" blocks):")
    gname = "frontend(fused)" if FUSE != "never" else "gardner"
    for name, t in (("coarse mix", t_mix), ("agc", t_agc), ("mf", t_mf),
                    (gname, t_grd), ("extract", t_ext),
                    ("frame stages", t_frm), ("decode", t_dec)):
        print(f"  {name:13s} {t * 1e3:8.1f} ms  ({100 * t / t_step:4.1f}% "
              f"of step)")
    print(f"  stages sum    {tot * 1e3:8.1f} ms")
    print(f"  FULL STEP     {t_step * 1e3:8.1f} ms -> {mbps:.1f} Mb/s")


if __name__ == "__main__":
    main()
