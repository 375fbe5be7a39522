"""Full RX chain: coarse-freq derotation -> matched filter -> timing
recovery -> frame sync -> PL descramble -> fine freq/phase sync -> deframe ->
demod -> FEC decode.

Equivalent of the reference RX binding (src/mains/TX_RX/main.cpp:200-266 /
RX/main_sched.cpp:197-223), re-designed as one jitted function over a
(B, F*L*osf, 2) sample-stream batch with ALL module state in an explicit
``RxState`` pytree: B independent streams ride the lane axis; per-frame
modules (frame sync, L&R) advance via ``lax.scan`` over the F frames of the
block; feedback DSP (Gardner) scans per sample.

Sync mode per Config: perfect_sync=True uses the genie timing (known channel
delay) and genie coarse derotation (known CFO); otherwise the real Gardner
loop runs and the coarse derotator applies the per-stream frequency learned
during acquisition (chains/acquisition.py), frozen exactly like the
reference's tracking phase (the PLL's update_phase is only driven from the
step-MF path, Synchronizer_step_mf_cc.cpp:205-207).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import bch, cplx, estimator, filters, framer, interleaver
from dvbs2_tpu.ops import ldpc, modem, scrambler, sync


class RxState(NamedTuple):
    coarse: sync.CoarseState         # coarse-freq PLL/DDS (frozen in tracking)
    mf: jnp.ndarray                  # matched-filter history
    gardner: sync.GardnerState
    timing_frac: jnp.ndarray         # Farrow history (perfect-timing path)
    extract: sync.ExtractState
    fsync: sync.FrameSyncState
    lr: sync.LrState
    sample_idx: jnp.ndarray          # () int32 stream position


def rx_init(cfg: Config, batch: int) -> RxState:
    L = cfg.pl_frame_size
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    return RxState(
        coarse=sync.coarse_init(batch, L),
        mf=filters.fir_init(len(taps), batch),
        gardner=sync.gardner_init(batch, cfg.shp_osf),
        timing_frac=jnp.zeros((batch, 3, 2), jnp.float32),
        # carry ring cap: a MULTIPLE OF L (so the underflow-path clip
        # drops whole frames and keeps the stream frame-aligned) sized
        # to 2 frames — in lock the carry holds ~1 symbol, and on a slip
        # the step is invalidated + delay-bumped regardless of how much
        # excess is kept (the reference keeps everything,
        # Synchronizer_timing.hxx:262-304; any multiple-of-L cap is the
        # same approximation).  Was 8 frames, which made the carry the
        # dominant state-threading cost (~65 ms/step at bench geometry)
        extract=sync.extract_init(batch, cap=2 * L),
        fsync=sync.frame_sync_init(batch, L),
        lr=sync.lr_init(batch),
        sample_idx=jnp.int32(0),
    )


def rx_frames(x: jnp.ndarray, sigma_true, cfg: Config, state: RxState,
              n_frames: int, decode: bool = True, act: bool = True):
    """Process a (B, n_frames*L*osf, 2) sample stream; decode n_frames.

    Returns (bits (B, n_frames, K_bch) or None if decode=False, info dict
    with per-frame delay/flag + per-stream underflow count, new RxState).
    """
    B, N_samp, _ = x.shape
    L = cfg.pl_frame_size
    assert N_samp == n_frames * L * cfg.shp_osf
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)

    # fused tracking front-end: coarse mix + AGC + matched filter +
    # blocked Gardner in one VMEM-resident Pallas kernel (the XLA stage
    # sequence below paid per-block scan overhead that dominated the
    # full-chain step; AGC scale computed on the pre-mix block — the
    # variance is rotation-invariant up to the mean term, FER-neutral)
    fuse = (cfg.fused_frontend == "always"
            or (cfg.fused_frontend == "auto"
                and jax.default_backend() not in ("cpu",)))
    fuse = (fuse and not cfg.perfect_sync and act
            and cfg.stm_type == "ULTRA" and cfg.sfc_type != "PERFECT"
            and cfg.shp_osf == 2 and B % 8 == 0)
    if fuse:
        from dvbs2_tpu.ops import frontend_pallas as _fp
        fuse = _fp.pick_hold(N_samp, cfg.stm_hold_size) >= 8
    if fuse:
        from dvbs2_tpu.ops import frontend_pallas
        # "always" on the CPU backend runs the kernel in interpret mode
        # (Mosaic has no CPU lowering) so the forced path still works in
        # CPU-only environments/tests instead of failing at lowering
        y, strobe, coarse_state, mf_state, gstate = \
            frontend_pallas.frontend(
                x, cfg, state.coarse, state.mf, state.gardner,
                interpret=(jax.default_backend() == "cpu"))
        frac_state = state.timing_frac
    else:
        # coarse frequency derotation (frozen per-stream nu; genie knows
        # the CFO)
        if cfg.perfect_sync or cfg.sfc_type == "PERFECT":
            y, _nco = sync.coarse_perfect(
                x, cfg.chn_max_freq_shift,
                filters.NcoState(n=state.coarse.n[0]))
            coarse_state = state.coarse._replace(
                n=jnp.broadcast_to(_nco.n, state.coarse.n.shape))
        else:
            y, coarse_state = sync.coarse_mix(x, state.coarse)

        # AGC at sample level (the reference normalizes the extracted
        # symbol blocks to unit energy, Multiplier_AGC_cc_naive; at the
        # sample rate the equivalent target is 1/osf per sample)
        y = filters.agc(y, output_energy=1.0 / cfg.shp_osf)

        # matched filter
        y, mf_state = filters.fir(y, taps, state.mf)

        # timing recovery
        if cfg.perfect_sync or cfg.stm_type == "PERFECT":
            y, strobe, frac_state = sync.timing_perfect(
                y, cfg.chn_max_delay, cfg.shp_osf, state.timing_frac)
            gstate = state.gardner
        else:
            y, strobe, gstate = sync.gardner(y, cfg, state.gardner,
                                             act=act)
            frac_state = state.timing_frac

    # strobed-symbol extraction -> (B, n_frames, L, 2).  On TPU the
    # dense masked-shift compaction replaces the generic scatter (the
    # tracking strobe pattern is alternation with rare slips; patterns
    # beyond its drift bound — e.g. un-acquired pull-in transients —
    # raise `overflow`, which invalidates the step's frames WITHOUT the
    # slip bump: the count bookkeeping stays exact, only values are
    # unreliable for that step)
    if jax.default_backend() not in ("cpu",) and cfg.shp_osf == 2:
        # (osf==2 only: the fast compaction assumes pair-alternation
        # strobe density 1/2; other osf would drift past the bound and
        # flag every step)
        syms, ex_state, uf, ovf = sync.extract_strobed_fast(
            y, strobe, n_frames * L, state.extract)
    else:
        syms, ex_state, uf = sync.extract_strobed(
            y, strobe, n_frames * L, state.extract)
        ovf = jnp.zeros_like(uf)
    syms = syms.reshape(B, n_frames, L, 2)

    # per-frame stages with carried state: frame sync + L&R
    sfm_perfect = cfg.perfect_sync or cfg.sfm_type == "PERFECT"
    sff_perfect = cfg.perfect_sync or cfg.sff_type == "PERFECT"
    if sfm_perfect and not (cfg.perfect_sync or cfg.stm_type == "PERFECT"):
        raise ValueError(
            "sfm_type=PERFECT requires stm_type=PERFECT (or perfect_sync): "
            "the genie frame realign is calibrated against the genie "
            "timing delay")
    if sfm_perfect:
        # genie frame sync (fixed known symbol delay, flag always true,
        # Synchronizer_frame_perfect.cpp:26-53) + genie fine freq/phase
        # (known residual = 0, Synchronizer_freq_fine_perfect) — the fine
        # estimators are bypassed exactly like the reference's PERFECT
        # variants, so this mode truly isolates FEC from synchronization
        # Symbol delay at the timing-sync output: two RRC group delays +
        # channel integer delay + 3 samples for the two cascaded Farrow
        # stages (channel frac delay + genie interpolator).  This differs
        # from the reference's ref_delay formula (2*grp_delay +
        # (floor(max_delay)+1)/osf) by one symbol because this build's
        # channel applies floor(max_delay) integer samples total (see
        # chains/channel_chain.py delay decomposition note); the value is
        # pinned by tests at osf=2 only.
        assert cfg.shp_osf == 2, "genie timing delay calibrated for osf=2"
        known_delay = (2 * cfg.shp_grp_delay * cfg.shp_osf
                       + int(cfg.chn_max_delay) + 3) // cfg.shp_osf

        def per_frame(carry, frame):
            fs, lr = carry
            ext = jnp.concatenate([fs.delay_buf, frame], axis=1)
            aligned = ext[:, known_delay:known_delay + L]
            descr = scrambler.pl_scramble(aligned, descramble=True)
            fs = fs._replace(delay_buf=frame, prev_sym=frame[:, -1:])
            if sff_perfect:
                fine = descr      # genie fine: known residual freq/phase 0
            else:
                derot, _f_lr, lr = sync.lr_fine_freq(descr, cfg, lr)
                fine, _f, _p = sync.phase_freq_fine(derot, cfg)
            return (fs, lr), (fine,
                              jnp.full((B,), known_delay, jnp.int32),
                              jnp.ones((B,), bool))
    if sfm_perfect:
        frames_t = syms.transpose(1, 0, 2, 3)        # (F, B, L, 2)
        (fs_state, lr_state), (fine, delays, flags) = jax.lax.scan(
            per_frame, (state.fsync, state.lr), frames_t)
        fine = fine.transpose(1, 0, 2, 3)            # (B, F, L, 2)
        delays = delays.T                            # (B, F)
        flags = flags.T
    else:
        # frame-sync correlation for ALL frames as one banded-matmul FIR
        # (the per-stage breakdown showed the correlator conv, not the
        # per-frame scan, dominating this stage — see filters.fir_mm);
        # the EMA/argmax/realign + descramble + fine stages then scan per
        # frame (a batched realign variant was measured SLOWER: the
        # B*F-row window moves cost more than the scan saves)
        corr_all, prev_sym, fir_st = sync.frame_sync_corr(
            syms.reshape(B, n_frames * L, 2), state.fsync)
        corr_all = corr_all.reshape(B, n_frames, L)

        def per_frame(carry, inp):
            frame, corr = inp
            fs, lr = carry
            aligned, delay, flag, metric, fs = sync.frame_sync_update(
                frame, corr, cfg, fs)
            descr = scrambler.pl_scramble(aligned, descramble=True)
            if sff_perfect:
                fine = descr      # genie fine: known residual freq/phase 0
            else:
                derot, _f_lr, lr = sync.lr_fine_freq(descr, cfg, lr)
                fine, _f, _p = sync.phase_freq_fine(derot, cfg)
            return (fs, lr), (fine, delay, flag)

        frames_t = syms.transpose(1, 0, 2, 3)        # (F, B, L, 2)
        fs0 = state.fsync._replace(prev_sym=prev_sym, fir_state=fir_st)
        (fs_state, lr_state), (fine, delays, flags) = jax.lax.scan(
            per_frame, (fs0, state.lr),
            (frames_t, corr_all.transpose(1, 0, 2)))
        fine = fine.transpose(1, 0, 2, 3)            # (B, F, L, 2)
        delays = delays.T
        flags = flags.T

    new_state = RxState(coarse=coarse_state, mf=mf_state, gardner=gstate,
                        timing_frac=frac_state, extract=ex_state,
                        fsync=fs_state, lr=lr_state,
                        sample_idx=state.sample_idx + N_samp)
    info = {"delay": delays, "flag": flags,
            "underflow": uf.astype(jnp.int32),
            "overflow": ovf.astype(jnp.int32)}
    if not decode:
        return None, info, new_state

    fine = fine.reshape(B * n_frames, L, 2)
    # PLH/pilot removal + demod + decode (flat batch B*n_frames)
    xfec = framer.deframe(fine, cfg.modcod)
    if cfg.est_type == "PERFECT":
        sg = jnp.asarray(sigma_true, jnp.float32)
        if sg.ndim == 1:          # per-stream sigma -> per flat (b, f) frame
            sg = jnp.repeat(sg, n_frames)[:, None]
        else:
            sg = jnp.broadcast_to(sg, (xfec.shape[0], 1))
    else:
        sg = estimator.estimate_sigma(xfec)
    llr = modem.demodulate(xfec, sg, cfg.mod)
    llr = interleaver.deinterleave(llr, cfg.itl_n_cols, cfg.read_order)
    post = ldpc.decode(llr, cfg.ldpc_code, n_ite=cfg.ldpc_nite,
                       implem=cfg.ldpc_implem,
                       norm_factor=cfg.ldpc_norm_factor,
                       syndrome_exit=cfg.ldpc_syndrome_exit)
    hard = ldpc.hard_decision(post)[:, :cfg.N_bch]
    info_bits, _ok = bch.decode(hard, cfg.K_bch)
    bits = scrambler.bb_scramble(info_bits).reshape(B, n_frames, cfg.K_bch)
    return bits, info, new_state
