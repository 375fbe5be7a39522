#!/usr/bin/env python
"""Joint LDPC-table selection across MODCODs sharing a rate.

A table that lands on refs/TX_RX_BB under QPSK can still sit off the curve
under 8PSK/16APSK: the column interleaver maps fixed codeword spans to
constellation bits of unequal reliability, so a reconstruction's weak spots
are weighted differently per modulation.  The default table per rate must
therefore minimize the JOINT chi2 over every MODCOD that uses the rate.

Usage:
  python tools/joint_scan.py --rate 3/5 --variants v3s1,v3s2,... \
      [--target-fe 250] [--out ldpc_joint_3_5.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config                     # noqa: E402
from tools.parity_sweep import measure_fer, log_ratio_sigma  # noqa: E402

# (modcod, est, ebn0, fer_ref, fe_ref) — the steepest well-measured ref
# points (refs/TX_RX_BB/*.txt) per MODCOD, two per rate-defining QPSK curve
POINTS = {
    "3/5": [
        ("QPSK-S_3/5", "DVBS2", 1.4, 3.40e-2, 110),
        ("QPSK-S_3/5", "DVBS2", 1.5, 2.34e-3, 101),
        ("8PSK-S_3/5", "DVBS2", 2.8, 1.70e-1, 151),
        ("8PSK-S_3/5", "DVBS2", 2.9, 2.30e-2, 103),
    ],
    "8/9": [
        ("QPSK-S_8/9", "DVBS2", 3.7, 5.39e-2, 121),
        ("QPSK-S_8/9", "DVBS2", 3.8, 3.51e-3, 102),
        ("8PSK-S_8/9", "DVBS2", 6.4, 3.10e-2, 110),
        ("16APSK-S_8/9", "PERFECT", 7.4, 1.16e-2, 111),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", required=True, choices=["3/5", "8/9"])
    ap.add_argument("--variants", required=True)
    ap.add_argument("--target-fe", type=int, default=250)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    pts = POINTS[args.rate]
    out = {"rate": args.rate, "target_fe": args.target_fe, "results": {}}
    for var in args.variants.split(","):
        print(f"== {args.rate} {var}", flush=True)
        chi2 = 0.0
        rows = []
        for (modcod, est, ebn0, fer_ref, fe_ref) in pts:
            cfg = Config(modcod=modcod, ldpc_implem="SPA", ldpc_nite=50,
                         est_type=est, ldpc_variant=var)
            fe, fr, _ = measure_fer(
                cfg, ebn0, target_fe=args.target_fe, verbose=False,
                seed_base=zlib.crc32(f"{var}/{modcod}/{ebn0}".encode())
                % 10000)
            fer = fe / max(fr, 1)
            s = log_ratio_sigma(fe, fe_ref)
            z = math.log(max(fer, 1e-12) / fer_ref) / s
            chi2 += z * z
            rows.append({"modcod": modcod, "ebn0": ebn0, "fer": fer,
                         "fer_ref": fer_ref, "ratio": fer / fer_ref,
                         "fe": fe, "fra": fr, "z": z})
            print(f"    {modcod} @{ebn0}: ratio={fer/fer_ref:.3f} z={z:+.2f}",
                  flush=True)
        out["results"][var] = {"chi2": chi2, "points": rows}
        print(f"  {var}: joint chi2={chi2:.1f}", flush=True)
        # incremental write so a timeout/kill loses at most one variant
        path = args.out or f"ldpc_joint_{args.rate.replace('/', '_')}.json"
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    ranked = sorted(out["results"], key=lambda v: out["results"][v]["chi2"])
    out["ranking"] = ranked
    print("RANKING:", ", ".join(
        f"{v}({out['results'][v]['chi2']:.1f})" for v in ranked))
    path = args.out or f"ldpc_joint_{args.rate.replace('/', '_')}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
