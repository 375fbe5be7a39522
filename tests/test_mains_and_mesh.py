"""File-based mains flow (tx -> ch -> rx) and the sharded Monte-Carlo step."""
import os

import jax
import numpy as np
import pytest

from dvbs2_tpu.config import Config


def test_tx_ch_rx_file_flow(tmp_path):
    """dvbs2_tx -> dvbs2_ch -> dvbs2_rx equivalents over USER_BIN files."""
    from dvbs2_tpu.mains import tx as tx_main
    from dvbs2_tpu.mains import ch as ch_main
    from dvbs2_tpu.mains import rx as rx_main
    txf = str(tmp_path / "tx.bin")
    chf = str(tmp_path / "ch.bin")
    snk = str(tmp_path / "sink.out")
    base = ["--mod-cod", "QPSK-S_8/9", "--dec-implem", "MS", "--dec-ite", "4",
            "--chn-max-delay", "4.5"]
    tx_main.main(base + ["--rad-tx-file-path", txf, "--tx-frames", "16"])
    assert os.path.getsize(txf) == 16 * 8370 * 2 * 2 * 4  # F*L*osf*2*f32
    ch_main.main(base + ["--rad-rx-file-path", txf, "--rad-tx-file-path",
                         chf, "-m", "18.0", "--rad-rx-no-loop"])
    assert os.path.getsize(chf) > 0
    rx_main.main(base + ["--rad-rx-file-path", chf, "--rx-frames", "16",
                         "--snk-path", snk, "-m", "18.0"])
    assert os.path.getsize(snk) > 0


def test_sharded_step_8_devices():
    """Data-parallel Monte-Carlo over the virtual 8-device CPU mesh with
    psum monitor reduction (the Monitor_reduction equivalent)."""
    assert len(jax.devices()) >= 8
    from dvbs2_tpu.parallel.mesh import sharded_step
    import jax.numpy as jnp
    cfg = Config(ldpc_implem="MS", ldpc_nite=2)
    fn = sharded_step(cfg, per_device_batch=1, n_devices=8)
    r = fn(jax.random.key(0), jnp.float32(cfg.ebn0_to_sigma(7.0)))
    assert int(r.n_frames) == 8


def test_graft_entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    assert int(out.n_frames) == 8
    mod.dryrun_multichip(8)
