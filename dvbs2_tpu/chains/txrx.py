"""Full-chain Monte-Carlo: TX shaping -> channel impairments -> RX sync +
decode — the `dvbs2_tx_rx` equivalent (reference: src/mains/TX_RX/main.cpp).

One step processes F consecutive frames for B independent streams (B rides
the TPU lane axis through every scan — the INTER strategy applied to the
whole chain). Stream continuity (filters, delays, NCO, sync loops) is
carried in an explicit state pytree across steps; RX output lags TX by
``frame_lag`` whole frames after frame-sync realignment, so the monitor
compares RX frame j with the TX bits ``frame_lag`` frames earlier and skips
the warmup frames, mirroring the reference's delay_tx_rx accounting
(TX_RX/main.cpp:661-670).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.chains.rx import RxState, rx_frames, rx_init
from dvbs2_tpu.chains.tx import TxState, tx_stream
from dvbs2_tpu.ops import filters


def _taps(cfg: Config):
    return filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)


def total_sample_delay(cfg: Config) -> int:
    """End-to-end sample delay at the timing-sync output: TX shaping group
    delay + channel integer delay + (channel Farrow + RX Farrow = 3) +
    matched-filter group delay."""
    gd = cfg.shp_grp_delay * cfg.shp_osf
    return 2 * gd + int(cfg.chn_max_delay) + 3


def frame_lag(cfg: Config) -> int:
    """Whole frames of TX->RX latency after frame-sync realignment."""
    sym_delay = math.ceil(total_sample_delay(cfg) / cfg.shp_osf)
    return math.ceil(sym_delay / cfg.pl_frame_size)


class TxRxState(NamedTuple):
    tx: TxState
    ch: channel_chain.ChannelState
    rx: RxState
    prev_bits: jnp.ndarray    # (B, frame_lag, K) TX bits still in flight
    frame_count: jnp.ndarray  # () int32 frames processed per stream


def txrx_init(cfg: Config, batch: int) -> TxRxState:
    lag = frame_lag(cfg)
    n_hist = (len(_taps(cfg)) + cfg.shp_osf - 1) // cfg.shp_osf
    return TxRxState(
        tx=TxState(shp=jnp.zeros((batch, n_hist, 2), jnp.float32)),
        ch=channel_chain.init_state(cfg, batch),
        rx=rx_init(cfg, batch),
        prev_bits=jnp.zeros((batch, lag, cfg.K_bch), jnp.int8),
        frame_count=jnp.int32(0),
    )


class FullStepResult(NamedTuple):
    be: jnp.ndarray
    fe: jnp.ndarray
    n_frames: jnp.ndarray
    state: TxRxState


def txrx_step(key: jax.Array, sigma, cfg: Config, state: TxRxState,
              batch: int, frames_per_step: int,
              warmup_frames: int = 8) -> FullStepResult:
    """Run ``frames_per_step`` frames through the full chain for ``batch``
    independent streams; count errors on frames past the warmup."""
    B, F = batch, frames_per_step
    lag = frame_lag(cfg)
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (B, F, cfg.K_bch)).astype(jnp.int8)

    x, tx_state = tx_stream(bits, cfg, state.tx)
    y, ch_state = channel_chain.apply(kn, x, sigma, cfg, state.ch)
    dec, _info, rx_state = rx_frames(y, sigma, cfg, state.rx, F)

    # reference bits for RX frame j of this step: TX frame j - lag
    ref = jnp.concatenate([state.prev_bits, bits], axis=1)[:, :F]
    errs = jnp.sum(dec != ref, axis=-1)                   # (B, F)
    # exclude warmup frames (global frame index < warmup + lag)
    gidx = state.frame_count + jnp.arange(F)[None, :]
    valid = jnp.broadcast_to(gidx >= (warmup_frames + lag), (B, F))
    be = jnp.sum(jnp.where(valid, errs, 0))
    fe = jnp.sum(jnp.where(valid, errs > 0, False))

    new_state = TxRxState(
        tx=tx_state, ch=ch_state, rx=rx_state,
        prev_bits=jnp.concatenate([state.prev_bits, bits], axis=1)[:, F:],
        frame_count=state.frame_count + F)
    return FullStepResult(be=be, fe=fe,
                          n_frames=jnp.sum(valid.astype(jnp.int32)),
                          state=new_state)


@functools.lru_cache(maxsize=None)
def jit_step(cfg: Config, batch: int, frames_per_step: int):
    def step(key, sigma, state):
        return txrx_step(key, sigma, cfg, state, batch, frames_per_step)
    return jax.jit(step)
