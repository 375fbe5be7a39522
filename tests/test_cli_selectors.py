"""Per-stage sync type selectors: CLI -> Config round-trip and the mixed
per-stage genie paths (reference factory dispatch:
Factory/Module/Synchronizer_timing/Synchronizer_timing.cpp:33-38,
Synchronizer_frame.cpp:31-34, Synchronizer_freq_coarse.cpp:30-36,
Synchronizer_freq_fine.cpp:30-34 — every stage has a PERFECT genie
variant selectable independently of the others)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.cli import build_parser, config_from_args
from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx


def test_stage_selector_flags_round_trip():
    p = build_parser("dvbs2_tx_rx")
    args = p.parse_args([
        "--stm-type", "FAST", "--stm-hold-size", "128",
        "--sfm-type", "PERFECT", "--sfc-type", "PERFECT",
        "--sff-type", "PERFECT",
    ])
    cfg = config_from_args(args)
    assert cfg.stm_type == "FAST"
    assert cfg.stm_hold_size == 128
    assert cfg.sfm_type == "PERFECT"
    assert cfg.sfc_type == "PERFECT"
    assert cfg.sff_type == "PERFECT"
    # defaults mirror the Config defaults
    cfg2 = config_from_args(p.parse_args([]))
    assert cfg2.stm_type == Config.stm_type
    assert cfg2.sfm_type == Config.sfm_type
    assert cfg2.sfc_type == Config.sfc_type
    assert cfg2.sff_type == Config.sff_type


def test_sfm_perfect_requires_stm_perfect():
    cfg = Config(modcod="QPSK-S_8/9", sfm_type="PERFECT", stm_type="FAST")
    B = 2
    state = txrx.txrx_init(cfg, B)
    with pytest.raises(ValueError, match="sfm_type=PERFECT requires"):
        txrx.jit_step(cfg, B, 1)(
            jax.random.key(0), jnp.float32(0.1), state)


def test_mixed_stage_genie_chain_decodes_clean():
    """stm/sfm/sfc PERFECT but sff NORMAL: the real L&R + phase/freq fine
    estimators run on genie-aligned frames — at a comfortable SNR all
    frames past L&R convergence must decode error-free.  Exercises the
    per-stage mix that the all-or-nothing perfect_sync flag could not
    express.

    L&R convergence matters even at zero CFO: the phase/freq LS fit
    unwraps inter-pilot phase steps of 2*pi*f*1476, so an unconverged L&R
    f-hat error above ~1/(2*1476)=3.4e-4 aliases the fit.  The reference
    converges L&R over LEARNING3's 200 frames before tracking
    (TX_RX/main.cpp:556-613); here the test warm-starts the EMA at its
    analytically-known converged value for zero residual CFO — the
    clean-pilot autocorrelation (the alpha=0.999 fixed point is the
    per-frame acc itself, and pilots are deterministic)."""
    import dataclasses

    from dvbs2_tpu.ops import framer, modem, sync

    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
                 est_type="PERFECT", chn_max_freq_shift=0.0,
                 chn_max_delay=4.0,
                 stm_type="PERFECT", sfm_type="PERFECT",
                 sfc_type="PERFECT", sff_type="NORMAL")
    B, F = 2, 2
    sigma = jnp.float32(cfg.ebn0_to_sigma(7.0))
    state = txrx.txrx_init(cfg, B)
    # converged L&R state: one clean (noiseless, unrotated) frame pushed
    # through the estimator with alpha=0 gives r_acc == acc_clean
    kb = jax.random.key(99)
    bits = jax.random.bernoulli(
        kb, 0.5, (1, cfg.N_xfec_frame * cfg.bps)).astype(jnp.int8)
    clean = framer.frame(modem.modulate(bits, cfg.mod), cfg.modcod)
    cfg_a0 = dataclasses.replace(cfg, sff_lr_alpha=0.0)
    _, _, warm = sync.lr_fine_freq(clean, cfg_a0, sync.lr_init(1))
    state = state._replace(rx=state.rx._replace(
        lr=sync.LrState(r_acc=jnp.broadcast_to(warm.r_acc, (B, 2)))))
    step = txrx.jit_step(cfg, B, F)
    key = jax.random.key(5)
    fe = n = 0
    for i in range(10):
        r = step(jax.random.fold_in(key, i), sigma, state)
        state = r.state
        fe += int(r.fe)
        n += int(r.n_frames)
    assert n > 0, "no frames counted past warmup"
    assert fe == 0, f"mixed-genie chain had {fe}/{n} frame errors"
