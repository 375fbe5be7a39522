#!/usr/bin/env python
"""UEP row-placement scan: close the 8PSK/16APSK FER gap by searching WHERE
the high-degree LDPC groups sit relative to the column interleaver's
bit-reliability spans (reference: Interleaver_core_column_row,
DVBS2.cpp:451-476; Gray structure of conf/mod/8PSK.mod).

Key facts exploited:
  * A row-placement permutation is a pure coordinate permutation of the
    code: QPSK FER (no interleaver, uniform bit reliability) is EXACTLY
    invariant, so the frozen QPSK-parity winners stay at parity for free
    and only the 8PSK/16APSK points need measuring.
  * The permutation is applied as a traced group gather around the fixed
    base codec (ops/ldpc.py group_perm), so the whole scan reuses ONE
    compiled BB step per (modcod, read-order) — hundreds of candidates at
    zero recompile cost.

Phases:
  screen  — every (placement spec x read order) at the steepest-but-one
            8PSK ref point, small FE target; rank by z.
  deep    — survivors at every refs/TX_RX_BB point of every high-order
            MODCOD sharing the rate (8/9: 8PSK-S_8/9 AND 16APSK-S_8/9 —
            joint selection), large FE target.

Usage:
  python tools/uep_place_scan.py --rate 3/5 [--seeds 64] [--screen-fe 80]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config                      # noqa: E402
from dvbs2_tpu.chains import txrx_bb                     # noqa: E402
from dvbs2_tpu.data import ldpc_tables                   # noqa: E402

# refs/TX_RX_BB points (modcod, est, [(ebn0, fer_ref, fe_ref)])
POINTS = {
    "8PSK-S_3/5": ("DVBS2", [(2.7, 5.01e-1, 182), (2.8, 1.70e-1, 151),
                             (2.9, 2.30e-2, 103), (3.0, 1.88e-3, 101)]),
    "8PSK-S_8/9": ("DVBS2", [(6.2, 4.76e-1, 138), (6.3, 1.66e-1, 153),
                             (6.4, 3.10e-2, 110), (6.5, 3.23e-3, 101)]),
    "16APSK-S_8/9": ("PERFECT", [(7.2, 2.76e-1, 221), (7.3, 7.29e-2, 118),
                                 (7.4, 1.16e-2, 111), (7.5, 9.23e-4, 100)]),
}
SCREEN_MODCOD = {"3/5": "8PSK-S_3/5", "8/9": "8PSK-S_8/9"}
DEEP_MODCODS = {"3/5": ["8PSK-S_3/5"],
                "8/9": ["8PSK-S_8/9", "16APSK-S_8/9"]}

BATCH = 256
INNER = 8


def perm_for(rate: str, spec: str) -> np.ndarray:
    t = ldpc_tables.get_table(rate)
    return np.asarray(ldpc_tables.placement_order(
        t.n_groups, [len(r) for r in t.rows], spec), np.int32)


def make_step(cfg: Config):
    @jax.jit
    def scan_step(key, sigma, perm):
        def body(carry, i):
            be, fe, fr = carry
            r = txrx_bb.txrx_bb_step(jax.random.fold_in(key, i), sigma,
                                     cfg, BATCH, group_perm=perm)
            return (be + r.be, fe + r.fe, fr + r.n_frames), None
        c, _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            jnp.arange(INNER))
        return c
    return scan_step


def measure(step, cfg, ebn0, perm, target_fe, seed_base, max_frames=3_000_000):
    sigma = jnp.float32(cfg.ebn0_to_sigma(ebn0))
    pj = jnp.asarray(perm)
    fe = fr = 0
    i = 0
    pending = []
    while fe < target_fe and fr + len(pending) * BATCH * INNER < max_frames:
        pending.append(step(jax.random.key(seed_base * 100003 + i), sigma, pj))
        i += 1
        if len(pending) >= 4:
            o = pending.pop(0)
            fe += int(o[1])
            fr += int(o[2])
    for o in pending:
        fe += int(o[1])
        fr += int(o[2])
    return fe, fr


def zscore(fe, fr, fer_ref, fe_ref):
    fer = fe / max(fr, 1)
    s = math.sqrt(1.0 / max(fe, 1) + 1.0 / max(fe_ref, 1))
    return fer, math.log(max(fer, 1e-12) / fer_ref) / s


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rate", required=True, choices=["3/5", "8/9"])
    ap.add_argument("--base", default=None,
                    help="base variant (default: frozen DEFAULT_VARIANT)")
    ap.add_argument("--seeds", type=int, default=64,
                    help="number of S<k> random-placement candidates")
    ap.add_argument("--screen-fe", type=int, default=80)
    ap.add_argument("--confirm-fe", type=int, default=150)
    ap.add_argument("--deep-fe", type=int, default=400)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--deep-top", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rate = args.rate
    base_var = args.base or ldpc_tables.DEFAULT_VARIANT[rate]
    base_rate = f"{rate}@{base_var}"
    out_path = args.out or f"ldpc_place_{rate.replace('/', '_')}.json"
    t0_all = time.perf_counter()

    specs = ["F", "L", "M", "E"] + [f"S{k}" for k in range(args.seeds)]
    modcod = SCREEN_MODCOD[rate]
    est, pts = POINTS[modcod]
    screen_pt = pts[2]          # steepest-but-one (cheap, discriminating)
    confirm_pt = pts[3]

    base_ro = Config(modcod=modcod).read_order
    steps = {}
    results = {"rate": rate, "base_variant": base_var, "screen": {},
               "note": ("QPSK FER is exactly invariant under row placement "
                        "(coordinate permutation) — QPSK parity of the base "
                        "variant carries over to every candidate")}

    def get_step(mc, ro, est_type):
        if (mc, ro) not in steps:
            cfg = Config(modcod=mc, ldpc_implem="SPA", ldpc_nite=50,
                         est_type=est_type, ldpc_variant=base_var,
                         itl_read_order=ro)
            steps[(mc, ro)] = (make_step(cfg), cfg)
        return steps[(mc, ro)]

    # ---- phase 1: screen ----
    import zlib
    rows = []
    for ro in (base_ro, "TOP_LEFT" if base_ro == "TOP_RIGHT"
               else "TOP_RIGHT"):
        step, cfg = get_step(modcod, ro, est)
        for spec in specs:
            perm = perm_for(base_rate, spec)
            ebn0, fer_ref, fe_ref = screen_pt
            sb = zlib.crc32(f"{spec}/{ro}/{ebn0}".encode()) % 10000
            fe, fr = measure(step, cfg, ebn0, perm, args.screen_fe, sb)
            fer, z = zscore(fe, fr, fer_ref, fe_ref)
            rows.append({"spec": spec, "read_order": ro, "ebn0": ebn0,
                         "fer": fer, "ratio": fer / fer_ref, "z": z,
                         "fe": fe, "fra": fr})
            print(f"  screen {spec:>4}@{ro[-5:]}: ratio={fer/fer_ref:.3f} "
                  f"z={z:+.2f} (fra={fr})", flush=True)
            results["screen"] = rows
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)

    # ---- phase 2: confirm top candidates at the deepest screen point ----
    rows.sort(key=lambda r: abs(r["z"]))
    top = rows[:args.top]
    print(f"== confirm top {len(top)} at ebn0={confirm_pt[0]}", flush=True)
    confirms = []
    for r in top:
        step, cfg = get_step(modcod, r["read_order"], est)
        perm = perm_for(base_rate, r["spec"])
        ebn0, fer_ref, fe_ref = confirm_pt
        sb = zlib.crc32(f"c/{r['spec']}/{r['read_order']}".encode()) % 10000
        fe, fr = measure(step, cfg, ebn0, perm, args.confirm_fe, sb)
        fer, z = zscore(fe, fr, fer_ref, fe_ref)
        chi2 = r["z"] ** 2 + z ** 2
        confirms.append({**r, "confirm_ebn0": ebn0, "confirm_fer": fer,
                         "confirm_ratio": fer / fer_ref, "confirm_z": z,
                         "chi2_2pt": chi2})
        print(f"  confirm {r['spec']:>4}@{r['read_order'][-5:]}: "
              f"ratio={fer/fer_ref:.3f} z={z:+.2f} chi2={chi2:.2f}",
              flush=True)
        results["confirm"] = confirms
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # ---- phase 3: deep joint measurement across the rate's MODCODs ----
    confirms.sort(key=lambda r: r["chi2_2pt"])
    deep = []
    for r in confirms[:args.deep_top]:
        entry = {"spec": r["spec"], "read_order": r["read_order"],
                 "points": [], "chi2": 0.0}
        for mc in DEEP_MODCODS[rate]:
            est2, pts2 = POINTS[mc]
            # read-order knob applies to the scanned modcod; others use
            # their standard order
            ro = r["read_order"] if mc == modcod else Config(
                modcod=mc).read_order
            step, cfg = get_step(mc, ro, est2)
            perm = perm_for(base_rate, r["spec"])
            for (ebn0, fer_ref, fe_ref) in pts2:
                sb = zlib.crc32(f"d/{r['spec']}/{mc}/{ebn0}".encode()) % 10000
                fe, fr = measure(step, cfg, ebn0, perm, args.deep_fe, sb)
                fer, z = zscore(fe, fr, fer_ref, fe_ref)
                entry["points"].append(
                    {"modcod": mc, "ebn0": ebn0, "fer": fer,
                     "fer_ref": fer_ref, "ratio": fer / fer_ref,
                     "fe": fe, "fra": fr, "z": z})
                entry["chi2"] += z * z
                print(f"  deep {r['spec']:>4} {mc} @{ebn0}: "
                      f"ratio={fer/fer_ref:.3f} z={z:+.2f}", flush=True)
                results["deep"] = deep + [entry]
                with open(out_path, "w") as f:
                    json.dump(results, f, indent=1)
        deep.append(entry)
    deep.sort(key=lambda e: e["chi2"])
    results["deep"] = deep
    results["wall_s"] = round(time.perf_counter() - t0_all, 1)
    if deep:
        w = deep[0]
        results["winner"] = {
            "variant": f"{base_var}-p{w['spec']}",
            "read_order": w["read_order"], "chi2": w["chi2"],
            "worst_abs_z": max(abs(p["z"]) for p in w["points"])}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}"
          + (f"; winner {results['winner']}" if deep else ""))


if __name__ == "__main__":
    main()
