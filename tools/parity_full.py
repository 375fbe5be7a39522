#!/usr/bin/env python
"""Full-chain (dvbs2_tx_rx) FER parity sweep against refs/TX_RX.

Reproduces the reference's five full-chain configurations — CFO {0, 0.05} x
channel delay {4.0, 4.5} samples + the F=2 inter variant, QPSK-S_8/9,
SPA-50 — over their Eb/N0 grids (src/mains/TX_RX/main.cpp:402-730).

TPU-native execution plan: all SNR points of one configuration run as one
lockstep stream batch with per-stream sigma (each stream is an independent
simulation — the acquisition phases therefore run ONCE per configuration,
per stream, exactly as the reference runs them once per point).  Streams
are allocated to points proportionally to the expected frame count
(1/FER_ref), so the deep waterfall point gets most of the batch.  Writes
parity_full.json.

Usage:
  python tools/parity_full.py [--streams 64] [--target-fe 100] \
      [--configs 000_45,005_45,000_40,005_40,000_45_F2]
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
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config           # noqa: E402
from dvbs2_tpu.chains import txrx             # noqa: E402

# refs/TX_RX/QPSK_8_9_freq_<f>_delay_<d>[_inter].txt
#   -> (cfo, delay, {ebn0: (fer, fe)})
REFS_FULL = {
    "000_40": (0.00, 4.0, {3.4: (9.90e-01, 100), 3.5: (8.77e-01, 100),
                           3.6: (4.69e-01, 100), 3.7: (1.53e-01, 100),
                           3.8: (2.27e-02, 100), 3.9: (1.36e-03, 100),
                           4.0: (1.56e-04, 100)}),
    "000_45": (0.00, 4.5, {3.5: (9.26e-01, 100),
                           3.6: (5.85e-01, 100), 3.7: (2.22e-01, 100),
                           3.8: (3.29e-02, 100), 3.9: (2.64e-03, 100),
                           4.0: (2.32e-04, 100)}),
    "005_40": (0.05, 4.0, {3.5: (8.62e-01, 100),
                           3.6: (5.10e-01, 100), 3.7: (1.38e-01, 100),
                           3.8: (1.97e-02, 100), 3.9: (1.52e-03, 100),
                           4.0: (1.52e-04, 100)}),
    "005_45": (0.05, 4.5, {3.5: (9.01e-01, 100),
                           3.6: (6.25e-01, 100), 3.7: (2.24e-01, 100),
                           3.8: (3.55e-02, 100), 3.9: (2.89e-03, 100)}),
    # the -F 2 inter-frame variant (QPSK_8_9_freq_000_delay_45_inter.txt)
    "000_45_F2": (0.00, 4.5, {3.5: (9.35e-01, 100),
                              3.6: (6.58e-01, 100), 3.7: (2.29e-01, 100),
                              3.8: (2.94e-02, 100), 3.9: (3.55e-03, 100),
                              4.0: (2.09e-04, 100)}),
}


def allocate_streams(points, refs, total: int) -> list:
    """Streams per point, proportional to expected frames (1/FER_ref),
    at least one each."""
    w = np.array([1.0 / refs[p][0] for p in points])
    n = np.maximum(1, np.floor(total * w / w.sum()).astype(int))
    while n.sum() > total:
        n[np.argmax(n)] -= 1
    n[np.argmax(w)] += total - n.sum()
    return [int(v) for v in n]


import functools


@functools.lru_cache(maxsize=None)
def _accumulator(P: int):
    @jax.jit
    def acc(tot, be_s, fe_s, n_s, seg):
        return (tot[0] + jax.ops.segment_sum(be_s, seg, P),
                tot[1] + jax.ops.segment_sum(fe_s, seg, P),
                tot[2] + jax.ops.segment_sum(n_s, seg, P))
    return acc


def measure_config(cfg: Config, dyn, ref: dict, target_fe: int,
                   total_streams: int, F: int, max_steps: int, seed: int = 0,
                   fetch_every: int = 50):
    """Acquire once (all points batched), then run transmission steps until
    every point has ``target_fe`` frame errors (or max_steps).

    ``cfg`` is the SHARED base config (CFO 0, integer-delay part only);
    ``dyn`` = traced (cfo, frac_delay) — all five refs/TX_RX configs then
    reuse the same compiled acquisition + step programs (they differ only
    in these two scalars; the integer delay part is 4 for all)."""
    points = sorted(ref.keys())
    alloc = allocate_streams(points, ref, total_streams)
    B = sum(alloc)
    owner = np.repeat(np.arange(len(points)), alloc)       # stream -> point
    sigma = jnp.asarray(
        np.repeat([cfg.ebn0_to_sigma(p) for p in points], alloc), jnp.float32)

    key = jax.random.key(seed)
    state = txrx.txrx_init(cfg, B)
    t0 = time.perf_counter()
    state = txrx.acquire(jax.random.fold_in(key, 0xACE), sigma, cfg, state,
                         B, dyn=dyn)
    t_acq = time.perf_counter() - t0

    step = txrx.jit_step(cfg, B, F, with_dyn=True)
    acc = _accumulator(len(points))
    seg = jnp.asarray(owner)

    tot = (jnp.zeros(len(points), jnp.int32),) * 3
    need = np.array([target_fe] * len(points))
    t0 = time.perf_counter()
    i = 0
    while i < max_steps:
        r = step(jax.random.fold_in(key, 1 + i), sigma, state, dyn)
        state = r.state
        tot = acc(tot, r.be_s, r.fe_s, r.n_s, seg)
        i += 1
        if i % fetch_every == 0:
            fe = np.asarray(tot[1])
            if np.all(fe >= need):
                break
    be, fe, fra = (np.asarray(t) for t in tot)
    dt = time.perf_counter() - t0
    return points, alloc, be, fe, fra, dt, t_acq, i


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", default="000_45,005_45,000_40,005_40,000_45_F2")
    p.add_argument("--target-fe", type=int, default=100)
    p.add_argument("--streams", type=int, default=64)
    p.add_argument("--frames-per-step", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=60_000)
    p.add_argument("--no-split-sat", dest="split_sat", action="store_false",
                   help="keep saturated points in the deep batch (forces "
                        "full decoder iterations every step)")
    p.add_argument("--stm-type", default="ULTRA", choices=["ULTRA", "FAST"],
                   help="ULTRA (blocked Gardner) is now exact at every "
                        "timing offset including the delay-4.0 mu wrap "
                        "boundary (round-4 fix: body mu derived from the "
                        "NCO, ops/sync.py gardner_block; the round-3 "
                        "~2e-2 floor is regression-tested away in "
                        "tests/test_gardner_blocked.py)")
    p.add_argument("--dec-implem", default="SPA")
    p.add_argument("--dec-ite", type=int, default=50)
    p.add_argument("--out", default="parity_full.json")
    args = p.parse_args()
    out = {"decoder": f"{args.dec_implem}-{args.dec_ite}",
           "streams": args.streams, "target_fe": args.target_fe,
           "configs": {}}
    # merge with an existing artifact so configs can be (re)measured
    # across runs without hand-editing (round-3 advisory: the committed
    # file must be reproducible by the checked-in tool)
    if os.path.exists(args.out):
        try:
            prev = json.load(open(args.out))
            if prev.get("decoder") == out["decoder"]:
                out["configs"].update(prev.get("configs", {}))
        except Exception:
            pass
    worst = 0.0
    # ONE base config for every parity config: CFO and the fractional
    # delay ride in as traced scalars (same compiled programs throughout)
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem=args.dec_implem,
                 ldpc_nite=args.dec_ite, chn_max_freq_shift=0.0,
                 chn_max_delay=4.0, stm_type=args.stm_type)
    out["stm_type"] = args.stm_type
    for name in args.configs.split(","):
        cfo, delay, ref = REFS_FULL[name]
        assert int(delay) == 4
        # cfo_mix applies one f32 nearest-1e-6 rule to static and traced
        # nu alike (ops/filters.py quantize_nu), so the raw CFO can be fed
        # straight to the traced chain
        dyn = (jnp.float32(cfo), jnp.float32(delay - int(delay)))
        print(f"== {name} (CFO={cfo}, delay={delay})", flush=True)
        # Saturated points (ref FER ~1) never pass the decoder's
        # syndrome exit (batch-global), so mixing them into the deep batch
        # makes every step decode at full iterations (~3x slower steps,
        # measured in round 3's first run).  With compiles shared across
        # configs (traced dyn), the separate small sat batch costs one
        # extra compile set TOTAL, so splitting is the default.
        thr = 0.3 if args.split_sat else 1.1
        sat = {e: v for e, v in ref.items() if v[0] >= thr}
        deep = {e: v for e, v in ref.items() if v[0] < thr}
        rows = []
        meta = {}
        for tag, sub, streams in (("sat", sat, max(8, 2 * len(sat))),
                                  ("deep", deep, args.streams)):
            if not sub:
                continue
            points, alloc, be, fe, fra, dt, t_acq, steps = measure_config(
                cfg, dyn, sub, args.target_fe, streams,
                args.frames_per_step, args.max_steps,
                seed=zlib.crc32(f"{name}/{tag}".encode()) & 0x7FFF)
            thr = int(fra.sum()) * cfg.K_bch / dt / 1e6
            meta[tag] = {"acq_s": round(t_acq, 1), "steps": steps,
                         "thr_mbps": round(thr, 2), "wall_s": round(dt, 1)}
            for j, ebn0 in enumerate(points):
                fer_ref, fe_ref = sub[ebn0]
                fer = int(fe[j]) / max(int(fra[j]), 1)
                s = math.sqrt(1.0 / max(int(fe[j]), 1)
                              + 1.0 / max(fe_ref, 1))
                z = math.log(max(fer, 1e-12) / fer_ref) / s
                worst = max(worst, abs(z))
                rows.append({"ebn0": ebn0, "streams": alloc[j], "fer": fer,
                             "fer_ref": fer_ref, "ratio": fer / fer_ref,
                             "be": int(be[j]), "fe": int(fe[j]),
                             "fra": int(fra[j]), "z_mc": z})
                print(f"    ebn0={ebn0:.2f} FER={fer:.4e} "
                      f"(ref {fer_ref:.2e}, ratio {fer/fer_ref:.3f}, "
                      f"z={z:+.2f}) fra={int(fra[j])}", flush=True)
            print(f"    [{name}/{tag}] {steps} steps, {dt:.0f}s "
                  f"({thr:.1f} Mb/s), acq {t_acq:.0f}s", flush=True)
        rows.sort(key=lambda r: r["ebn0"])
        out["configs"][name] = {"rows": rows, "stm_type": args.stm_type,
                                **meta}
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)   # incremental
    # worst |z| over ALL configs in the (possibly merged) artifact, plus
    # separately over the delay-4.0 PARITY configs (the delay-4.5 configs
    # measure better-than-ref for diagnosed physical reasons —
    # PARITY_FULL_STATUS.md — so their z << 0 is not a parity failure)
    worst = max((abs(r["z_mc"]) for c in out["configs"].values()
                 for r in c["rows"]), default=worst)
    out["worst_abs_z"] = worst
    par_rows = [r for n, c in out["configs"].items() if n.endswith("_40")
                for r in c["rows"]]
    if par_rows:
        out["worst_abs_z_parity_configs"] = max(abs(r["z_mc"])
                                                for r in par_rows)
        ns = [r for r in par_rows if r["ebn0"] == 4.0]
        out["north_star"] = [{"fer": r["fer"], "fer_ref": r["fer_ref"],
                              "fe": r["fe"], "fra": r["fra"],
                              "z": r["z_mc"]} for r in ns]
    out["note"] = ("z_mc = log-FER deviation in combined MC std units "
                   "(bar |z|<2.5); all SNR points of a config batched as "
                   "independent streams with per-stream sigma; acquisition "
                   "(WAITING+LEARNING 1-3) run once per config on the full "
                   "batch; per-config stm_type recorded in each entry")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"worst |z| = {worst:.2f}; wrote {args.out}")


if __name__ == "__main__":
    main()
