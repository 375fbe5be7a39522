"""Full-chain Monte-Carlo: TX shaping -> channel impairments -> RX sync +
decode — the `dvbs2_tx_rx` equivalent (reference: src/mains/TX_RX/main.cpp).

One step processes F consecutive frames for B independent streams (B rides
the TPU lane axis through every scan — the INTER strategy applied to the
whole chain). Stream continuity (filters, delays, NCO, sync loops) is
carried in an explicit state pytree across steps.

TX->RX alignment mirrors the reference's delay_tx_rx accounting
(TX_RX/main.cpp:425-431,506,538,661-670): every timing-sync underflow
(processing_aborted in the reference) bumps a per-stream whole-frame slip
counter, and the monitor compares RX frame g with TX frame g - slips,
skipping warmup frames and any step that underflowed.

Acquisition (`acquire`) is the host state machine over the jitted phase
programs (chains/acquisition.py): WAITING until frame-sync lock, LEARNING
1&2 (coarse-PLL convergence at Bn=1e-4 then 5e-5), LEARNING 3 (L&R EMA
convergence through the tracking chain), then the caller runs `jit_step` for
the TRANSMISSION phase.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import acquisition, channel_chain
from dvbs2_tpu.chains.rx import RxState, rx_frames, rx_init
from dvbs2_tpu.chains.tx import TxState, tx_stream
from dvbs2_tpu.ops import filters

SLIP_HEADROOM = 8    # extra in-flight TX frames kept beyond the nominal lag


def _taps(cfg: Config):
    return filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)


def total_sample_delay(cfg: Config) -> int:
    """End-to-end sample delay at the timing-sync output: TX shaping group
    delay + channel integer delay + (channel Farrow + RX Farrow = 3) +
    matched-filter group delay."""
    gd = cfg.shp_grp_delay * cfg.shp_osf
    return 2 * gd + int(cfg.chn_max_delay) + 3


def frame_lag(cfg: Config) -> int:
    """Nominal whole frames of TX->RX latency (the steady-state slip count
    reached after the startup underflows)."""
    sym_delay = math.ceil(total_sample_delay(cfg) / cfg.shp_osf)
    return math.ceil(sym_delay / cfg.pl_frame_size)


def bits_depth(cfg: Config) -> int:
    return frame_lag(cfg) + SLIP_HEADROOM


class TxRxState(NamedTuple):
    tx: TxState
    ch: channel_chain.ChannelState
    rx: RxState
    prev_bits: jnp.ndarray    # (B, depth, K) TX bits still in flight
    frame_count: jnp.ndarray  # () int32 frames processed per stream
    slips: jnp.ndarray        # (B,) int32 whole-frame TX->RX lag


def txrx_init(cfg: Config, batch: int) -> TxRxState:
    n_hist = (len(_taps(cfg)) + cfg.shp_osf - 1) // cfg.shp_osf
    return TxRxState(
        tx=TxState(shp=jnp.zeros((batch, n_hist, 2), jnp.float32)),
        ch=channel_chain.init_state(cfg, batch),
        rx=rx_init(cfg, batch),
        prev_bits=jnp.zeros((batch, bits_depth(cfg), cfg.K_bch), jnp.int8),
        frame_count=jnp.int32(0),
        # the reference inits delay_tx_rx to the nominal overall delay and
        # bumps it on every abort (TX_RX/main.cpp:425-431,506)
        slips=jnp.full((batch,), frame_lag(cfg), jnp.int32),
    )


def _tx_and_channel(key: jax.Array, sigma, cfg: Config, state: TxRxState,
                    batch: int, F: int, dyn=None):
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5,
                                (batch, F, cfg.K_bch)).astype(jnp.int8)
    x, tx_state = tx_stream(bits, cfg, state.tx)
    # sigma may be per-stream (B,) — each stream is an independent
    # simulation, so a batch can sweep several SNR points at once
    sg = jnp.asarray(sigma, jnp.float32)
    if sg.ndim == 1:
        sg = sg[:, None, None]
    y, ch_state = channel_chain.apply(kn, x, sg, cfg, state.ch, dyn=dyn)
    return bits, y, tx_state, ch_state


class FullStepResult(NamedTuple):
    be: jnp.ndarray          # () total bit errors this step
    fe: jnp.ndarray          # () total frame errors
    n_frames: jnp.ndarray    # () total monitored frames
    state: TxRxState
    be_s: jnp.ndarray = None   # (B,) per-stream bit errors
    fe_s: jnp.ndarray = None   # (B,) per-stream frame errors
    n_s: jnp.ndarray = None    # (B,) per-stream monitored frames


def txrx_step(key: jax.Array, sigma, cfg: Config, state: TxRxState,
              batch: int, frames_per_step: int,
              warmup_frames: int = 8, dyn=None) -> FullStepResult:
    """Run ``frames_per_step`` frames through the full chain for ``batch``
    independent streams; count errors on frames past the warmup.
    ``dyn`` = optional traced (cfo, chn_frac_mu) channel impairments
    (chains/channel_chain.impair)."""
    B, F = batch, frames_per_step
    depth = bits_depth(cfg)
    bits, y, tx_state, ch_state = _tx_and_channel(
        key, sigma, cfg, state, B, F, dyn=dyn)
    dec, info, rx_state = rx_frames(y, sigma, cfg, state.rx, F)

    # reference bits for RX frame g of stream b: TX frame g - slips_b
    cat = jnp.concatenate([state.prev_bits, bits], axis=1)  # (B, depth+F, K)
    idx = depth + jnp.arange(F)[None, :] - state.slips[:, None]
    ref = cat[jnp.arange(B)[:, None], jnp.clip(idx, 0, depth + F - 1)]
    errs = jnp.sum(dec != ref, axis=-1)                   # (B, F)
    gidx = state.frame_count + jnp.arange(F)[None, :]
    uf = info["underflow"]                                # (B,) 0/1
    ovf = info.get("overflow", jnp.zeros_like(uf))
    valid = ((gidx >= warmup_frames + state.slips[:, None])
             & (idx >= 0) & (uf[:, None] == 0) & (ovf[:, None] == 0))
    be_s = jnp.sum(jnp.where(valid, errs, 0), axis=1)
    fe_s = jnp.sum(jnp.where(valid, errs > 0, False), axis=1)
    n_s = jnp.sum(valid.astype(jnp.int32), axis=1)

    new_state = TxRxState(
        tx=tx_state, ch=ch_state, rx=rx_state,
        prev_bits=cat[:, F:],
        frame_count=state.frame_count + F,
        slips=state.slips + uf * F)
    return FullStepResult(be=jnp.sum(be_s), fe=jnp.sum(fe_s),
                          n_frames=jnp.sum(n_s),
                          state=new_state, be_s=be_s, fe_s=fe_s, n_s=n_s)


@functools.lru_cache(maxsize=None)
def jit_step(cfg: Config, batch: int, frames_per_step: int,
             with_dyn: bool = False):
    if with_dyn:
        def step(key, sigma, state, dyn):
            return txrx_step(key, sigma, cfg, state, batch,
                             frames_per_step, dyn=dyn)
    else:
        def step(key, sigma, state):
            return txrx_step(key, sigma, cfg, state, batch, frames_per_step)
    return jax.jit(step)


# ---------------------------------------------------------------------------
# acquisition phases (WAITING / LEARNING 1-3)
# ---------------------------------------------------------------------------

class AcqStepResult(NamedTuple):
    state: TxRxState
    acq: acquisition.AcqState
    flag: jnp.ndarray      # (B,) frame-sync lock
    metric: jnp.ndarray    # (B,) frame-sync peak correlation


@functools.lru_cache(maxsize=None)
def jit_acq_step(cfg: Config, batch: int, norm_bandwidth: float,
                 frames: int = 1):
    """One WAITING/LEARNING-1/2 dispatch: ``frames`` frames per stream
    through TX -> channel -> step-MF acquisition (scanned on device so the
    host pays one tunnel round-trip per ``frames`` frames, not per frame);
    bits flow through the in-flight buffer so the eventual transmission
    phase stays aligned.  flag/metric returned are the LAST frame's."""
    def one(key, sigma, state: TxRxState, acq: acquisition.AcqState,
            dyn=None):
        bits, y, tx_state, ch_state = _tx_and_channel(
            key, sigma, cfg, state, batch, 1, dyn=dyn)
        acq2, flag, uf, metric = acquisition.acq_frame(
            y, cfg, acq, norm_bandwidth)
        new_state = TxRxState(
            tx=tx_state, ch=ch_state, rx=state.rx,
            prev_bits=jnp.concatenate([state.prev_bits, bits], axis=1)[:, 1:],
            frame_count=state.frame_count + 1,
            slips=state.slips + uf.astype(jnp.int32))
        return AcqStepResult(state=new_state, acq=acq2, flag=flag,
                             metric=metric)

    def step(key, sigma, state: TxRxState, acq: acquisition.AcqState,
             dyn=None):
        if frames == 1:
            return one(key, sigma, state, acq, dyn=dyn)

        def body(carry, i):
            st, aq = carry
            r = one(jax.random.fold_in(key, i), sigma, st, aq, dyn=dyn)
            return (r.state, r.acq), (r.flag, r.metric)
        (st, aq), (flags, metrics) = jax.lax.scan(
            body, (state, acq), jnp.arange(frames))
        return AcqStepResult(state=st, acq=aq, flag=flags[-1],
                             metric=metrics[-1])
    return jax.jit(step)


@functools.lru_cache(maxsize=None)
def jit_sync_step(cfg: Config, batch: int, frames_per_step: int):
    """One LEARNING-3 iteration: full tracking chain without FEC decode
    (reference sequence_learning_3 stops at sync_fine_pf,
    TX_RX/main.cpp:556-613)."""
    def step(key, sigma, state: TxRxState, dyn=None):
        F = frames_per_step
        bits, y, tx_state, ch_state = _tx_and_channel(
            key, sigma, cfg, state, batch, F, dyn=dyn)
        _none, info, rx_state = rx_frames(y, sigma, cfg, state.rx, F,
                                          decode=False, act=False)
        new_state = TxRxState(
            tx=tx_state, ch=ch_state, rx=rx_state,
            prev_bits=jnp.concatenate([state.prev_bits, bits],
                                      axis=1)[:, F:],
            frame_count=state.frame_count + F,
            slips=state.slips + info["underflow"] * F)
        return new_state
    return jax.jit(step)


def transplant(rx: RxState, acq: acquisition.AcqState) -> RxState:
    """Hand the acquisition front-end state over to the tracking chain
    (shared with the RX-side mains — chains/acquisition.transplant_rx)."""
    return acquisition.transplant_rx(rx, acq)


def acquire(key: jax.Array, sigma, cfg: Config, state: TxRxState,
            batch: int, max_waiting: int = 300, learn12: int = 150,
            learn3: int = 200, verbose: bool = False, trace: list = None,
            dyn=None):
    """Run WAITING + LEARNING 1&2 + LEARNING 3; returns the TxRxState ready
    for the transmission phase (monitor counters should start fresh).

    ``trace``: optional list collecting per-frame probe rows
    (phase, frame, metric_min, nu_mean, slips_max) — the counterpart of the
    reference's Reporter_probe sync-convergence dumps written per phase to
    --stats-path files (reference: src/mains/TX_RX/main.cpp:92-180,433-453).
    """
    acq = acquisition.acq_init(cfg, batch)
    # 8 frames per dispatch: one tunnel round-trip per 8 frames instead of
    # per frame (the WAITING lock check then overshoots by < 8 frames,
    # which only adds a few extra learning-grade frames before LEARNING 1)
    FD = 8 if trace is None else 1
    step_fast = jit_acq_step(cfg, batch, 1e-4, frames=FD)
    step_slow = jit_acq_step(cfg, batch, 5e-5, frames=FD)
    k = 0

    def next_key():
        nonlocal k
        k += 1
        return jax.random.fold_in(key, k)

    def probe(phase, i, r=None):
        if trace is None:
            return
        nu = float(jnp.mean(-acq.smf.coarse.est_freq))
        met = float(jnp.min(r.metric)) if r is not None else float("nan")
        trace.append((phase, i, met, nu, int(jnp.max(state.slips))))

    # WAITING: until every stream's frame-sync flag (PLL Bn=1e-4)
    for i in range(-(-max_waiting // FD)):
        r = step_fast(next_key(), sigma, state, acq, dyn)
        state, acq = r.state, r.acq
        probe("WAITING", i, r)
        if bool(jnp.all(r.flag)):
            break
    if verbose:
        print(f"# waiting done after {(i + 1) * FD} frames "
              f"(metric min {float(jnp.min(r.metric)):.1f})")

    # LEARNING 1 (Bn=1e-4) then LEARNING 2 (Bn=5e-5)
    for i in range(-(-learn12 // FD)):
        r = step_fast(next_key(), sigma, state, acq, dyn)
        state, acq = r.state, r.acq
        probe("LEARNING_1", i, r)
    for i in range(-(-learn12 // FD)):
        r = step_slow(next_key(), sigma, state, acq, dyn)
        state, acq = r.state, r.acq
        probe("LEARNING_2", i, r)
    if verbose:
        nu = -acq.smf.coarse.est_freq
        print(f"# learning 1&2 done (mixer nu {[f'{float(v):.6f}' for v in nu]})")

    # LEARNING 3: tracking chain, no decode (F frames per dispatch)
    state = state._replace(rx=transplant(state.rx, acq))
    F3 = 4 if trace is None else 1
    sync_step = jit_sync_step(cfg, batch, F3)
    for i in range(-(-learn3 // F3)):
        state = sync_step(next_key(), sigma, state, dyn)
        probe("LEARNING_3", i)
    return state
