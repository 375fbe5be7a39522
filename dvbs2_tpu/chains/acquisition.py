"""Acquisition phases — the TPU equivalent of the reference's WAITING /
LEARNING 1&2 / LEARNING 3 sequence rebinding (src/mains/TX_RX/main.cpp:
445-613 and RX/main_sched.cpp:407-635).

The reference swaps the RX front-end for a fused per-sample module
(`Synchronizer_step_mf_cc`: coarse-PLL step -> matched-filter step -> Gardner
step, each strobed symbol feeding the PLL phase detector) with a one-frame
feedback edge from the frame synchronizer's DEL output (`Feedbacker`). Here
the same fusion is one `lax.scan` (ops/sync.py:step_mf_scan) and the
feedback edge is simply the previous frame's DEL carried in `AcqState.del_fb`
— the host state machine in chains/txrx.py drives the phases:

  WAITING      step-MF @ PLL Bn=1e-4 until every stream's frame-sync flag
  LEARNING 1   150 frames @ Bn=1e-4
  LEARNING 2   150 frames @ Bn=5e-5
  LEARNING 3   200 frames through the tracking chain (coarse frozen) to
               converge the L&R EMA (alpha=0.999)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import filters, sync


class AcqState(NamedTuple):
    smf: sync.StepMfState
    extract: sync.ExtractState
    fsync: sync.FrameSyncState
    del_fb: jnp.ndarray     # (B,) i32 feedbacker memory = last frame-sync DEL


def acq_init(cfg: Config, batch: int) -> AcqState:
    L = cfg.pl_frame_size
    return AcqState(
        smf=sync.step_mf_init(batch, cfg),
        extract=sync.extract_init(batch, cap=4 * cfg.shp_osf * L),
        fsync=sync.frame_sync_init(batch, L),
        del_fb=jnp.zeros((batch,), jnp.int32),
    )


def transplant_rx(rx, acq: AcqState):
    """Hand the acquisition front-end over to the tracking chain (the
    reference's partial rebinding back to the normal path,
    TX_RX/main.cpp:556-581): coarse PLL frozen at the learned frequency;
    Gardner / matched-filter / extract / frame-sync state continue."""
    return rx._replace(
        coarse=acq.smf.coarse,
        mf=acq.smf.mf[:, 1:],        # FIR history = last T-1 inputs
        gardner=acq.smf.gardner,
        extract=acq.extract,
        fsync=acq.fsync,
    )


def acquire_stream(next_block, cfg: Config, batch: int = 1,
                   max_waiting: int = 600, learn12: int = 150,
                   learn3: int = 200, verbose: bool = False):
    """WAITING / LEARNING 1-3 driven by a radio/file sample stream — the
    RX-side mains' acquisition state machine (reference:
    src/mains/RX/main_sched.cpp:407-635, which runs the step-MF + feedbacker
    graph against radio.receive before entering transmission).

    ``next_block(n_samples)`` must return the next (B, n, 2) float block of
    the continuous stream.  Returns an ``RxState`` ready for ``rx_frames``
    tracking (coarse PLL frozen at the learned frequency).
    """
    import jax

    from dvbs2_tpu.chains.rx import rx_frames, rx_init

    acq = acq_init(cfg, batch)
    n = cfg.rad_frame_size
    step_fast = jax.jit(lambda x, st: acq_frame(x, cfg, st, 1e-4))
    step_slow = jax.jit(lambda x, st: acq_frame(x, cfg, st, 5e-5))
    flag = None
    for i in range(max_waiting):
        acq, flag, _uf, metric = step_fast(next_block(n), acq)
        if bool(jnp.all(flag)):
            break
    if verbose:
        print(f"# waiting done after {i + 1} frames "
              f"(metric min {float(jnp.min(metric)):.1f})")
    for _ in range(learn12):
        acq, _f, _u, _m = step_fast(next_block(n), acq)
    for _ in range(learn12):
        acq, _f, _u, _m = step_slow(next_block(n), acq)
    if verbose:
        nu = -acq.smf.coarse.est_freq
        print(f"# learning 1&2 done (mixer nu "
              f"{[f'{float(v):.6f}' for v in nu]})")
    rx = transplant_rx(rx_init(cfg, batch), acq)
    step3 = jax.jit(lambda x, st: rx_frames(x, 1.0, cfg, st, 1,
                                            decode=False, act=False)[1:])
    for _ in range(learn3):
        _info, rx = step3(next_block(n), rx)
    return rx


def acq_frame(x: jnp.ndarray, cfg: Config, st: AcqState,
              norm_bandwidth: float):
    """One acquisition iteration on one frame of channel samples
    (B, L*osf, 2).

    Returns (new state, flag (B,) frame-sync lock, underflow (B,),
    metric (B,) frame-sync peak correlation).
    """
    L = cfg.pl_frame_size
    # set_curr_idx from the DEL feedback + symbols already queued in the
    # extract buffer (Synchronizer_step_mf_cc::_synchronize:191-193): the
    # next strobed symbol sits at PL-frame index (queued - DEL) mod L.
    ci = jnp.mod(st.extract.count - st.del_fb, L).astype(jnp.int32)
    smf = st.smf._replace(coarse=st.smf.coarse._replace(curr_idx=ci))
    y, strobe, smf = sync.step_mf_scan(x, cfg, smf, norm_bandwidth)
    syms, ex, uf = sync.extract_strobed(y, strobe, L, st.extract)
    syms = filters.agc(syms, output_energy=1.0)
    _aligned, delay, flag, metric, fs = sync.frame_sync(syms, cfg, st.fsync)
    return AcqState(smf=smf, extract=ex, fsync=fs, del_fb=delay), \
        flag, uf, metric
