"""File-based mains flow (tx -> ch -> rx) and the sharded Monte-Carlo step."""
import os

import jax
import numpy as np
import pytest

from dvbs2_tpu.config import Config


def test_tx_ch_rx_file_flow(tmp_path):
    """dvbs2_tx -> dvbs2_ch -> dvbs2_rx over USER_BIN files, with the
    DECODED BITS compared to the transmitted source frames (a USER .src
    source makes the payload known)."""
    from dvbs2_tpu.io.radio import write_src_file
    from dvbs2_tpu.mains import tx as tx_main
    from dvbs2_tpu.mains import ch as ch_main
    from dvbs2_tpu.mains import rx as rx_main
    txf = str(tmp_path / "tx.bin")
    chf = str(tmp_path / "ch.bin")
    snk = str(tmp_path / "sink.out")
    srcf = str(tmp_path / "payload.src")
    K = 14232
    rng = np.random.RandomState(5)
    payload = rng.randint(0, 2, (4, K)).astype(np.int8)
    write_src_file(srcf, payload)
    base = ["--mod-cod", "QPSK-S_8/9", "--dec-implem", "MS", "--dec-ite", "4",
            "--chn-max-delay", "4.5"]
    n_tx = 16
    tx_main.main(base + ["--rad-tx-file-path", txf, "--tx-frames", str(n_tx),
                         "--src-type", "USER", "--src-path", srcf])
    assert os.path.getsize(txf) == n_tx * 8370 * 2 * 2 * 4  # F*L*osf*2*f32
    ch_main.main(base + ["--rad-rx-file-path", txf, "--rad-tx-file-path",
                         chf, "-m", "18.0", "--rad-rx-no-loop"])
    assert os.path.getsize(chf) > 0
    # --no-wl-phases: cold-start tracking (CFO=0 at 18 dB locks without
    # acquisition); the acquisition path is exercised by
    # test_rx_main_acquisition_cfo below
    rx_main.main(base + ["--rad-rx-file-path", chf, "--rx-frames",
                         str(n_tx), "--snk-path", snk, "-m", "18.0",
                         "--no-wl-phases"])
    dec = np.unpackbits(np.fromfile(snk, np.uint8))[:n_tx * K]
    dec = dec.reshape(-1, K).astype(np.int8)
    # after sync lock, decoded frames must reproduce the cycled payload
    # exactly; allow the acquisition transient to corrupt the early frames
    matches = sum(1 for f in dec[8:]
                  if any(np.array_equal(f, p) for p in payload))
    assert matches >= (len(dec) - 8) * 3 // 4, (
        f"only {matches}/{len(dec) - 8} post-lock frames matched the payload")


@pytest.mark.slow
def test_rx_main_acquisition_cfo(tmp_path):
    """tx -> ch (CFO=0.05, delay 4.5, Eb/N0=4.2) -> rx with the WAITING /
    LEARNING phases driven from the file stream (reference:
    RX/main_sched.cpp:407-635): the receiver must lock and decode the cycled
    payload (VERDICT r2 item 4)."""
    from dvbs2_tpu.io.radio import write_src_file
    from dvbs2_tpu.mains import tx as tx_main
    from dvbs2_tpu.mains import ch as ch_main
    from dvbs2_tpu.mains import rx as rx_main
    txf = str(tmp_path / "tx.bin")
    chf = str(tmp_path / "ch.bin")
    snk = str(tmp_path / "sink.out")
    srcf = str(tmp_path / "payload.src")
    K = 14232
    rng = np.random.RandomState(7)
    payload = rng.randint(0, 2, (4, K)).astype(np.int8)
    write_src_file(srcf, payload)
    base = ["--mod-cod", "QPSK-S_8/9", "--dec-implem", "SPA", "--dec-ite",
            "20", "--chn-max-delay", "4.5", "--chn-max-freq-shift", "0.05",
            "--chn-type", "SYNCHRO"]
    n_tx = 16
    tx_main.main(base + ["--rad-tx-file-path", txf, "--tx-frames", str(n_tx),
                         "--src-type", "USER", "--src-path", srcf])
    ch_main.main(base + ["--rad-rx-file-path", txf, "--rad-tx-file-path",
                         chf, "-m", "4.2", "--rad-rx-no-loop"])
    rx_main.main(base + ["--rad-rx-file-path", chf, "--rx-frames", "16",
                         "--snk-path", snk, "-m", "4.2",
                         "--acq-learn", "40", "--acq-learn3", "40"])
    dec = np.unpackbits(np.fromfile(snk, np.uint8))[:16 * K]
    dec = dec.reshape(-1, K).astype(np.int8)
    matches = sum(1 for f in dec[2:]
                  if any(np.array_equal(f, p) for p in payload))
    assert matches >= (len(dec) - 2) * 3 // 4, (
        f"only {matches}/{len(dec) - 2} frames matched after acquisition")


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


@pytest.mark.slow
def test_sharded_full_chain_8_devices():
    """Full-chain (dvbs2_tx_rx) step sharded over the virtual 8-device mesh:
    per-device sample-stream state, psum-reduced monitors."""
    assert len(jax.devices()) >= 8
    import jax.numpy as jnp
    from dvbs2_tpu.parallel.mesh import sharded_txrx_step
    cfg = Config(ldpc_implem="MS", ldpc_nite=2, chn_max_freq_shift=0.02,
                 chn_max_delay=4.5)
    step, state = sharded_txrx_step(cfg, streams_per_device=1,
                                    frames_per_step=2, n_devices=8)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    counts, state = step(jax.random.key(0), sigma, state)
    counts, state = step(jax.random.key(1), sigma, state)
    assert int(state.frame_count) == 4
    assert int(counts[2]) >= 0


@pytest.mark.slow
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
