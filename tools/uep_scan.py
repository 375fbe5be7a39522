#!/usr/bin/env python
"""UEP-aware LDPC table/read-order selection on the higher-order MODCODs.

The joint scan showed the reconstructed tables' QPSK and 8PSK standings
anti-correlate: under 8PSK/16APSK the column interleaver gives fixed
codeword spans unequal bit reliability (UEP), and a reconstruction's weak
spots sit in different spans than the genuine Annex C tables'.  This scan
measures candidates at the steep 8PSK/16APSK ref points under both read
orders, then checks QPSK for the survivors — producing the jointly-best
(table, read order) per rate.  Incremental JSON after every measurement.

Usage: python tools/uep_scan.py --rate 3/5 [--target-fe 200]
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

HI_POINTS = {   # the higher-order discriminating points
    "3/5": [("8PSK-S_3/5", "DVBS2", 2.8, 1.70e-1, 151),
            ("8PSK-S_3/5", "DVBS2", 2.9, 2.30e-2, 103)],
    "8/9": [("8PSK-S_8/9", "DVBS2", 6.4, 3.10e-2, 110),
            ("16APSK-S_8/9", "PERFECT", 7.4, 1.16e-2, 111)],
}
QPSK_POINTS = {
    "3/5": [("QPSK-S_3/5", "DVBS2", 1.4, 3.40e-2, 110),
            ("QPSK-S_3/5", "DVBS2", 1.5, 2.34e-3, 101)],
    "8/9": [("QPSK-S_8/9", "DVBS2", 3.7, 5.39e-2, 121),
            ("QPSK-S_8/9", "DVBS2", 3.8, 3.51e-3, 102)],
}
DEFAULT_CANDS = {
    "3/5": ["v3s2@STD", "v3s2@ALT", "v3s3@ALT", "v3s4@ALT",
            "v3s7@STD", "v3s7@ALT", "v3s8@STD", "v3s8@ALT"],
    "8/9": ["v2s1@STD", "v2s1@ALT", "v2s2@STD", "v2s3@STD",
            "r1@STD", "v2s5@STD", "v2s6@STD"],
}


def alt_order(modcod_order: str) -> str:
    return "TOP_LEFT" if modcod_order == "TOP_RIGHT" else "TOP_RIGHT"


def measure(cand: str, points, rate, target_fe, out, results):
    var, _, orient = cand.partition("@")
    rows = results.setdefault(cand, {"points": [], "chi2": 0.0})
    for (modcod, est, ebn0, fer_ref, fe_ref) in points:
        if any(p["modcod"] == modcod and p["ebn0"] == ebn0
               for p in rows["points"]):
            continue
        base = Config(modcod=modcod)
        ro = base.read_order if orient == "STD" else alt_order(base.read_order)
        cfg = Config(modcod=modcod, ldpc_implem="SPA", ldpc_nite=50,
                     est_type=est, ldpc_variant=var, itl_read_order=ro)
        fe, fr, _ = measure_fer(
            cfg, ebn0, target_fe=target_fe, verbose=False,
            seed_base=zlib.crc32(f"{cand}/{modcod}/{ebn0}".encode()) % 10000)
        fer = fe / max(fr, 1)
        s = log_ratio_sigma(fe, fe_ref)
        z = math.log(max(fer, 1e-12) / fer_ref) / s
        rows["points"].append({"modcod": modcod, "ebn0": ebn0, "fer": fer,
                               "fer_ref": fer_ref, "ratio": fer / fer_ref,
                               "fe": fe, "fra": fr, "z": z,
                               "read_order": ro})
        rows["chi2"] = sum(p["z"] ** 2 for p in rows["points"])
        print(f"    {cand} {modcod} @{ebn0} [{ro}]: "
              f"ratio={fer/fer_ref:.3f} z={z:+.2f}", flush=True)
        with open(out, "w") as f:
            json.dump({"results": results}, f, indent=1)
        if fer >= 0.5 and fer / fer_ref > 5.0:
            # candidate is saturated at a point where the ref is deep in
            # the waterfall: every further point is uninformative — prune
            print(f"    {cand}: saturated (FER={fer:.2f}); pruning",
                  flush=True)
            break
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", required=True, choices=["3/5", "8/9"])
    ap.add_argument("--cands", default=None)
    ap.add_argument("--target-fe", type=int, default=200)
    ap.add_argument("--hi-gate", type=float, default=4.0,
                    help="max |z| on the hi points to advance to QPSK")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cands = (args.cands.split(",") if args.cands
             else DEFAULT_CANDS[args.rate])
    out = args.out or f"ldpc_uep_{args.rate.replace('/', '_')}.json"
    results = {}
    if os.path.exists(out):
        results = json.load(open(out)).get("results", {})
    # phase 1: higher-order points
    for cand in cands:
        print(f"== {args.rate} {cand} (hi)", flush=True)
        measure(cand, HI_POINTS[args.rate], args.rate, args.target_fe,
                out, results)
    # phase 2: QPSK for survivors
    for cand in cands:
        worst_hi = max(abs(p["z"]) for p in results[cand]["points"])
        if worst_hi > args.hi_gate:
            print(f"-- {cand}: skipped QPSK (hi |z|={worst_hi:.1f})",
                  flush=True)
            continue
        print(f"== {args.rate} {cand} (qpsk)", flush=True)
        measure(cand, QPSK_POINTS[args.rate], args.rate, args.target_fe,
                out, results)
    ranked = sorted(results, key=lambda v: results[v]["chi2"]
                    / max(len(results[v]["points"]), 1))
    print("RANKING (chi2/point):", ", ".join(
        f"{v}({results[v]['chi2']:.1f}/{len(results[v]['points'])})"
        for v in ranked), flush=True)


if __name__ == "__main__":
    main()
