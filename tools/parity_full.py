#!/usr/bin/env python
"""Full-chain (dvbs2_tx_rx) FER parity sweep against refs/TX_RX.

Reproduces the reference's four full-chain configurations — CFO {0, 0.05} x
channel delay {4.0, 4.5} samples, QPSK-S_8/9, SPA-50 — over their Eb/N0
grids, with the acquisition phases (WAITING / LEARNING 1-3) re-run at every
SNR point exactly like the reference harness (src/mains/TX_RX/main.cpp:
402-730).  Writes parity_full.json.

Usage:
  python tools/parity_full.py [--points 3.6,3.7,3.8,3.9,4.0] \
      [--target-fe 200] [--streams 32] [--configs 000_45,005_45,...]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config           # noqa: E402
from dvbs2_tpu.chains import txrx             # noqa: E402

# refs/TX_RX/QPSK_8_9_freq_<f>_delay_<d>.txt -> (cfo, delay, {ebn0: (fer, fe)})
REFS_FULL = {
    "000_40": (0.00, 4.0, {3.4: (9.90e-01, 100), 3.5: (8.77e-01, 100),
                           3.6: (4.69e-01, 100), 3.7: (1.53e-01, 100),
                           3.8: (2.27e-02, 100), 3.9: (1.36e-03, 100),
                           4.0: (1.56e-04, 100)}),
    "000_45": (0.00, 4.5, {3.2: (1.0, 100), 3.3: (1.0, 100), 3.4: (1.0, 100),
                           3.5: (9.26e-01, 100), 3.6: (5.85e-01, 100),
                           3.7: (2.22e-01, 100), 3.8: (3.29e-02, 100),
                           3.9: (2.64e-03, 100), 4.0: (2.32e-04, 100)}),
    "005_40": (0.05, 4.0, {3.4: (1.0, 100), 3.5: (8.62e-01, 100),
                           3.6: (5.10e-01, 100), 3.7: (1.38e-01, 100),
                           3.8: (1.97e-02, 100), 3.9: (1.52e-03, 100),
                           4.0: (1.52e-04, 100)}),
    "005_45": (0.05, 4.5, {3.2: (1.0, 100), 3.3: (1.0, 100), 3.4: (1.0, 100),
                           3.5: (9.01e-01, 100), 3.6: (6.25e-01, 100),
                           3.7: (2.24e-01, 100), 3.8: (3.55e-02, 100),
                           3.9: (2.89e-03, 100)}),
}


def measure_point(cfg: Config, ebn0: float, target_fe: int, B: int, F: int,
                  max_frames: int, seed: int = 0, fetch_every: int = 16):
    """Acquire, then run transmission steps until target_fe frame errors."""
    sigma = jnp.float32(cfg.ebn0_to_sigma(ebn0))
    key = jax.random.key(seed)
    state = txrx.txrx_init(cfg, B)
    t_acq0 = time.perf_counter()
    state = txrx.acquire(jax.random.fold_in(key, 0xACE), sigma, cfg,
                         state, B)
    t_acq = time.perf_counter() - t_acq0
    step = txrx.jit_step(cfg, B, F)

    @jax.jit
    def add(tot, a, b, c):
        return (tot[0] + a, tot[1] + b, tot[2] + c)

    tot = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    be = fe = fra = 0
    i = 0
    t0 = time.perf_counter()
    while fe < target_fe and fra < max_frames:
        r = step(jax.random.fold_in(key, 1 + i), sigma, state)
        state = r.state
        tot = add(tot, r.be, r.fe, r.n_frames)
        i += 1
        if i % fetch_every == 0:
            be, fe, fra = (int(tot[0]), int(tot[1]), int(tot[2]))
    be, fe, fra = (int(tot[0]), int(tot[1]), int(tot[2]))
    dt = time.perf_counter() - t0
    return be, fe, fra, dt, t_acq


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--points", default="3.6,3.7,3.8,3.9,4.0")
    p.add_argument("--configs", default="000_45,005_45,000_40,005_40")
    p.add_argument("--target-fe", type=int, default=200)
    p.add_argument("--streams", type=int, default=32)
    p.add_argument("--frames-per-step", type=int, default=8)
    p.add_argument("--max-frames", type=int, default=2_000_000)
    p.add_argument("--dec-implem", default="SPA")
    p.add_argument("--dec-ite", type=int, default=50)
    p.add_argument("--out", default="parity_full.json")
    args = p.parse_args()
    points = [float(x) for x in args.points.split(",")]
    out = {"decoder": f"{args.dec_implem}-{args.dec_ite}",
           "streams": args.streams, "configs": {}}
    worst = 0.0
    for name in args.configs.split(","):
        cfo, delay, ref = REFS_FULL[name]
        cfg = Config(modcod="QPSK-S_8/9", ldpc_implem=args.dec_implem,
                     ldpc_nite=args.dec_ite, chn_max_freq_shift=cfo,
                     chn_max_delay=delay)
        print(f"== freq_{name.split('_')[0]} delay_{name.split('_')[1]} "
              f"(CFO={cfo}, delay={delay})", flush=True)
        rows = []
        for ebn0 in points:
            if ebn0 not in ref:
                continue
            fer_ref, fe_ref = ref[ebn0]
            be, fe, fra, dt, t_acq = measure_point(
                cfg, ebn0, args.target_fe, args.streams,
                args.frames_per_step, args.max_frames)
            fer = fe / max(fra, 1)
            s = math.sqrt(1.0 / max(fe, 1) + 1.0 / max(fe_ref, 1))
            z = math.log(max(fer, 1e-12) / fer_ref) / s
            worst = max(worst, abs(z))
            thr = fra * cfg.K_bch / dt / 1e6
            rows.append({"ebn0": ebn0, "fer": fer, "fer_ref": fer_ref,
                         "ratio": fer / fer_ref, "fe": fe, "fra": fra,
                         "z_mc": z, "thr_mbps": thr, "acq_s": t_acq})
            print(f"    ebn0={ebn0:.2f} FER={fer:.4e} (ref {fer_ref:.2e}, "
                  f"ratio {fer/fer_ref:.3f}, z={z:+.2f}) fra={fra} "
                  f"thr={thr:.0f} Mb/s", flush=True)
        out["configs"][name] = rows
    out["worst_abs_z"] = worst
    out["note"] = ("z_mc = log-FER deviation in combined MC std units; "
                   "acquisition (WAITING+LEARNING) re-run per point, "
                   "excluded from thr")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"worst |z| = {worst:.2f}; wrote {args.out}")


if __name__ == "__main__":
    main()
