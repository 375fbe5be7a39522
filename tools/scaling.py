#!/usr/bin/env python
"""Measure mesh scaling efficiency of the sharded Monte-Carlo steps.

Real multi-chip hardware is not reachable from this environment (one
tunneled chip), so the scaling LAW is demonstrated on the virtual-device CPU
backend: run the sharded BB step and the sharded FULL-CHAIN step at
n_devices = 1 and N with the same per-device load, and report the parallel
efficiency  eff = t_1 / t_N  (perfect weak scaling = 1.0: wall time stays
flat as devices x work both grow N-fold).  The virtual devices share the
host's PHYSICAL cores, so the measured efficiency is floored by
n_cores/n_devices — the default N is min(requested, host cores) so the
number is meaningful, and an oversubscribed N (e.g. 8 devices on 2 cores)
is still reported as a correctness datapoint with its core-bound noted.
On a real slice the per-step cross-device traffic is a few psum'd scalars
(monitor counters) riding ICI, so per-chip throughput is expected flat to
the pod-slice scale; the CPU-mesh number is a floor, not a projection.

Writes SCALING.json.  Usage: python tools/scaling.py [--devices 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device-batch", type=int, default=16)
    ap.add_argument("--streams-per-device", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dvbs2_tpu.config import Config
    from dvbs2_tpu.parallel import mesh

    n_cores = len(os.sched_getaffinity(0))
    # core-bounded measurement: never exceed physical cores — on a 1-core
    # host an n=2 run is oversubscribed and its "efficiency" would be
    # scheduler noise, not a scaling datapoint (skip efficiency there)
    n_meas = min(args.devices, n_cores)
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    out = {"backend": "cpu-virtual", "devices_measured": n_meas,
           "devices_correctness": args.devices, "host_cores": n_cores,
           "note": ("weak-scaling efficiency at n_meas <= host cores; "
                    "the oversubscribed n=devices run only validates the "
                    "sharded program executes (cores bound wall time)"),
           "configs": {}}

    def time_fn(fn, *fn_args):
        r = fn(jax.random.key(0), *fn_args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(args.reps):
            r = fn(jax.random.key(i + 1), *fn_args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / args.reps

    ns = sorted({1, n_meas} | ({args.devices} if args.devices > n_meas
                                else set()))

    # BB chain
    rows = {}
    for n in ns:
        fn = mesh.sharded_step(cfg, args.per_device_batch, n)
        dt = time_fn(fn, sigma)
        thr = n * args.per_device_batch * cfg.K_bch / dt / 1e6
        rows[str(n)] = {"step_s": dt, "agg_info_mbps": thr}
        print(f"bb n={n}: {dt*1e3:.1f} ms/step, {thr:.1f} Mb/s aggregate",
              flush=True)
    rows["efficiency"] = (rows["1"]["step_s"] / rows[str(n_meas)]["step_s"]
                          if n_meas >= 2 else None)
    out["configs"]["bb_chain"] = rows

    # full chain (stream state sharded on the mesh)
    rows = {}
    for n in ns:
        fn, state = mesh.sharded_txrx_step(cfg, args.streams_per_device, 2, n)
        def step(key, sigma, state=state, fn=fn):
            counts, _ = fn(key, sigma, state)
            return counts
        dt = time_fn(step, sigma)
        fps = n * args.streams_per_device * 2 / dt
        rows[str(n)] = {"step_s": dt, "agg_frames_per_s": fps}
        print(f"full n={n}: {dt*1e3:.1f} ms/step, {fps:.1f} frames/s "
              "aggregate", flush=True)
    rows["efficiency"] = (rows["1"]["step_s"] / rows[str(n_meas)]["step_s"]
                          if n_meas >= 2 else None)
    out["configs"]["full_chain"] = rows

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    fmt = lambda v: "n/a(1-core)" if v is None else f"{v:.2f}"
    print(f"bb eff={fmt(out['configs']['bb_chain']['efficiency'])}  "
          f"full eff={fmt(out['configs']['full_chain']['efficiency'])}; "
          f"wrote {args.out}")


if __name__ == "__main__":
    main()
