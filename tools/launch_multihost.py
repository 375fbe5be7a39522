#!/usr/bin/env python
"""Local multi-process launcher for the multi-host distributed runtime
(dvbs2_tpu/parallel/distributed.py).

Spawns N worker processes on this machine, each a JAX process with its
own virtual CPU devices, connected through jax.distributed (gloo
collectives) into ONE global mesh — the same code path a real N-host
TPU pod runs (there, `initialize()` takes no arguments and devices are
real chips).

    python tools/launch_multihost.py --processes 2 --devices-per-proc 4 \
        --chain bb --batch 1 --steps 2 --ebn0 6.0

Process 0 prints one JSON line with the psum'd global counters, e.g.
    {"chain": "bb", "be": 0, "fe": 0, "n_frames": 16, ...}
which tests/test_multihost.py asserts equals the single-process
8-device run bit-for-bit (global axis index keying makes the two
topologies identical).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def worker(args):
    # env is set by the parent BEFORE python starts (XLA flags must
    # precede jax import); here: initialize distributed, run, report
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dvbs2_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address=f"localhost:{args.port}",
                    num_processes=args.processes,
                    process_id=args.process_id)
    import jax.numpy as jnp
    from dvbs2_tpu.config import Config

    cfg = Config(modcod=args.modcod, ldpc_implem="NMS",
                 ldpc_nite=args.dec_ite,
                 est_type="PERFECT" if args.chain == "full" else "DVBS2",
                 perfect_sync=args.chain == "full")
    sigma = jnp.float32(cfg.ebn0_to_sigma(args.ebn0))
    if args.chain == "bb":
        step = dist.sharded_bb_step_mh(cfg, args.batch)
        be = fe = n = 0
        for i in range(args.steps):
            r = step(jax.random.key(i), sigma)
            be += int(r.be); fe += int(r.fe); n += int(r.n_frames)
    else:
        step = dist.sharded_txrx_step_mh(cfg, args.batch, 1)
        state = dist.sharded_txrx_init_mh(cfg, args.batch)
        be = fe = n = 0
        for i in range(args.steps):
            (b, f, nf), state = step(jax.random.key(i), sigma, state)
            be += int(b); fe += int(f); n += int(nf)
    if args.process_id == 0:
        print(json.dumps({
            "chain": args.chain, "be": be, "fe": fe, "n_frames": n,
            "processes": args.processes,
            "global_devices": len(jax.devices()),
        }), flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=4)
    p.add_argument("--chain", choices=["bb", "full"], default="bb")
    p.add_argument("--modcod", default="QPSK-S_8/9")
    p.add_argument("--batch", type=int, default=1,
                   help="streams per DEVICE")
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--ebn0", type=float, default=6.0)
    p.add_argument("--dec-ite", type=int, default=10)
    p.add_argument("--port", type=int, default=12731)
    p.add_argument("--process-id", type=int, default=None,
                   help="(internal) run as worker with this id")
    args = p.parse_args()

    if args.process_id is not None:
        worker(args)
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count="
                        f"{args.devices_per_proc} "
                        "--xla_backend_optimization_level=0").strip()
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    base = [sys.executable, os.path.abspath(__file__),
            "--processes", str(args.processes),
            "--devices-per-proc", str(args.devices_per_proc),
            "--chain", args.chain, "--modcod", args.modcod,
            "--batch", str(args.batch), "--steps", str(args.steps),
            "--ebn0", str(args.ebn0), "--dec-ite", str(args.dec_ite),
            "--port", str(args.port)]
    for pid in range(args.processes):
        procs.append(subprocess.Popen(
            base + ["--process-id", str(pid)], env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, cwd=_REPO))
    out, _ = procs[0].communicate()
    rcs = [procs[0].returncode] + [q.wait() for q in procs[1:]]
    if any(rcs):
        sys.exit(f"worker exit codes {rcs}")
    sys.stdout.write(out.decode())


if __name__ == "__main__":
    main()
