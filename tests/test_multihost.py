"""Multi-host distributed runtime validation (SURVEY §2.5 distributed
backend; BASELINE.md "N>=2 hosts").

Spawns a REAL 2-process JAX cluster on this machine (gloo CPU
collectives, 4 virtual devices per process — the same code path an
N-host TPU pod runs) via tools/launch_multihost.py, and asserts the
psum'd global monitor counters equal the single-process 8-device run
bit-for-bit: per-device streams are keyed by GLOBAL mesh axis index, so
the two topologies execute identical per-stream programs and the only
difference is which process owns which shard.
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EBN0 = 6.0
STEPS = 2
BATCH = 1          # streams per device


def _single_process_reference():
    from dvbs2_tpu.config import Config
    from dvbs2_tpu.parallel import mesh

    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10)
    step = mesh.sharded_step(cfg, BATCH, 8)
    sigma = jnp.float32(cfg.ebn0_to_sigma(EBN0))
    be = fe = n = 0
    for i in range(STEPS):
        r = step(jax.random.key(i), sigma)
        be += int(r.be); fe += int(r.fe); n += int(r.n_frames)
    return be, fe, n


def test_two_process_mesh_equals_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend")
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "launch_multihost.py"),
         "--processes", "2", "--devices-per-proc", "4", "--chain", "bb",
         "--batch", str(BATCH), "--steps", str(STEPS),
         "--ebn0", str(EBN0), "--port", "12791"],
        capture_output=True, text=True, timeout=540, cwd=_REPO)
    assert out.returncode == 0, f"launcher failed:\n{out.stdout}\n{out.stderr}"
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    mh = json.loads(line)
    assert mh["global_devices"] == 8 and mh["processes"] == 2

    be, fe, n = _single_process_reference()
    assert n == 8 * BATCH * STEPS
    assert (mh["be"], mh["fe"], mh["n_frames"]) == (be, fe, n), (
        "multi-host psum'd counters diverge from the single-process "
        f"8-device run: {mh} vs {(be, fe, n)}")
