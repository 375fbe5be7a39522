#!/usr/bin/env python
"""Degree-profile sweep for the LDPC reconstruction — the code axis that
QPSK parity does NOT pin (see ldpc_place_*.json: UEP placement moves 8PSK
FER < ~20%, so the measured ~0.06 dB 8PSK deficit must sit in the graph's
response to the column interleaver's shaped bit reliabilities, which is set
by the variable-degree profile, unknown offline).

For each (profile, seed) candidate the screen measures the steepest QPSK
point AND the steepest-but-one 8PSK point (joint chi2; a candidate must
hold QPSK parity while improving 8PSK), pruning candidates far off on
either. Survivors get a deeper joint measurement.

Usage: python tools/profile_scan.py --rate 3/5 [--seeds 1,2] [--out ...]
"""
from __future__ import annotations

import argparse
import itertools
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

from dvbs2_tpu.config import Config                      # noqa: E402
from dvbs2_tpu.data import ldpc_tables                   # noqa: E402
from tools.parity_sweep import measure_fer, log_ratio_sigma  # noqa: E402

# (modcod, est, [(ebn0, fer_ref, fe_ref)]) — refs/TX_RX_BB
POINTS = {
    "3/5": {
        "qpsk": ("QPSK-S_3/5", "DVBS2",
                 [(1.4, 3.40e-2, 110), (1.5, 2.34e-3, 101)]),
        "hi": ("8PSK-S_3/5", "DVBS2",
               [(2.9, 2.30e-2, 103), (3.0, 1.88e-3, 101),
                (2.8, 1.70e-1, 151), (2.7, 5.01e-1, 182)]),
    },
    "8/9": {
        "qpsk": ("QPSK-S_8/9", "DVBS2",
                 [(3.7, 5.39e-2, 121), (3.8, 3.51e-3, 102)]),
        "hi": ("8PSK-S_8/9", "DVBS2",
               [(6.4, 3.10e-2, 110), (6.5, 3.23e-3, 101),
                (6.3, 1.66e-1, 153), (6.2, 4.76e-1, 138)]),
    },
}


def measure_point(cfg, ebn0, fer_ref, fe_ref, target_fe, tag):
    fe, fr, _ = measure_fer(cfg, ebn0, target_fe=target_fe, verbose=False,
                            seed_base=zlib.crc32(tag.encode()) % 10000)
    fer = fe / max(fr, 1)
    z = math.log(max(fer, 1e-12) / fer_ref) / log_ratio_sigma(fe, fe_ref)
    return {"ebn0": ebn0, "fer": fer, "fer_ref": fer_ref,
            "ratio": fer / fer_ref, "fe": fe, "fra": fr, "z": z}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rate", required=True, choices=["3/5", "8/9"])
    ap.add_argument("--profiles", default=None)
    ap.add_argument("--seeds", default="1,2")
    ap.add_argument("--screen-fe", type=int, default=100)
    ap.add_argument("--deep-fe", type=int, default=300)
    ap.add_argument("--qpsk-gate", type=float, default=3.5)
    ap.add_argument("--deep-top", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rate = args.rate
    profs = (args.profiles.split(",") if args.profiles
             else sorted(ldpc_tables.PROFILES[rate]))
    seeds = [int(s) for s in args.seeds.split(",")]
    out_path = args.out or f"ldpc_profile_{rate.replace('/', '_')}.json"
    P = POINTS[rate]
    results = {"rate": rate, "screen": {}, "deep": {}}
    t0 = time.perf_counter()

    def save():
        results["wall_s"] = round(time.perf_counter() - t0, 1)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # ---- screen: QPSK steepest-but-one then 8PSK steepest-but-one ----
    for prof, seed in itertools.product(profs, seeds):
        var = f"v4{prof}s{seed}"
        mcq, estq, ptsq = P["qpsk"]
        cfgq = Config(modcod=mcq, ldpc_implem="SPA", ldpc_nite=50,
                      est_type=estq, ldpc_variant=var)
        rq = measure_point(cfgq, *ptsq[0], args.screen_fe, f"{var}/q")
        row = {"variant": var, "qpsk": rq}
        print(f"  {var} QPSK@{ptsq[0][0]}: ratio={rq['ratio']:.3f} "
              f"z={rq['z']:+.2f}", flush=True)
        if abs(rq["z"]) <= args.qpsk_gate:
            mch, esth, ptsh = P["hi"]
            cfgh = Config(modcod=mch, ldpc_implem="SPA", ldpc_nite=50,
                          est_type=esth, ldpc_variant=var)
            rh = measure_point(cfgh, *ptsh[0], args.screen_fe, f"{var}/h")
            row["hi"] = rh
            row["chi2"] = rq["z"] ** 2 + rh["z"] ** 2
            print(f"  {var} 8PSK@{ptsh[0][0]}: ratio={rh['ratio']:.3f} "
                  f"z={rh['z']:+.2f} chi2={row['chi2']:.1f}", flush=True)
        else:
            print(f"  {var}: QPSK gate failed — skipping 8PSK", flush=True)
        results["screen"][var] = row
        save()

    # ---- deep: top-N by chi2, all screen-able points both modcods ----
    ranked = sorted((v for v in results["screen"].values() if "chi2" in v),
                    key=lambda v: v["chi2"])
    for row in ranked[:args.deep_top]:
        var = row["variant"]
        entry = {"points": [], "chi2": 0.0}
        for grp in ("qpsk", "hi"):
            mc, est, pts = P[grp]
            cfg = Config(modcod=mc, ldpc_implem="SPA", ldpc_nite=50,
                         est_type=est, ldpc_variant=var)
            for (ebn0, fer_ref, fe_ref) in pts:
                r = measure_point(cfg, ebn0, fer_ref, fe_ref, args.deep_fe,
                                  f"{var}/d/{mc}/{ebn0}")
                r["modcod"] = mc
                entry["points"].append(r)
                entry["chi2"] += r["z"] ** 2
                print(f"  deep {var} {mc}@{ebn0}: ratio={r['ratio']:.3f} "
                      f"z={r['z']:+.2f}", flush=True)
                results["deep"][var] = entry
                save()
    if results["deep"]:
        best = min(results["deep"], key=lambda v: results["deep"][v]["chi2"])
        results["winner"] = {
            "variant": best, "chi2": results["deep"][best]["chi2"],
            "worst_abs_z": max(abs(p["z"])
                               for p in results["deep"][best]["points"])}
    save()
    print("done:", results.get("winner"))


if __name__ == "__main__":
    main()
