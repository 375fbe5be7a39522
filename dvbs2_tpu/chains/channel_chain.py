"""Channel impairment chain — the `dvbs2_ch` equivalent (reference:
src/mains/CH/main.cpp:44-84: fading -> frame delay -> integer delay ->
fractional delay -> CFO shift -> AWGN; builders DVBS2.cpp:520-544,593-685).

Operates on the serialized oversampled stream (B, N, 2); every stage carries
explicit state so consecutive batches form one continuous channel.

Noise-type dispatch mirrors ``factory::DVBS2::build_channel``
(DVBS2.cpp:593-613): AWGN and SYNCHRO add Gaussian noise, USER_ADD adds
noise samples supplied by the caller (read from --chn-path); anything else
is rejected.  The SYNCHRO impairment stages are what the full TX_RX chain
binds unconditionally (TX_RX/main.cpp:219-236), so ``apply`` (used by
chains/txrx.py) always runs them, while mains/ch.py runs them only for
--chn-type SYNCHRO, exactly like the reference's dvbs2_ch.

Delay decomposition: the reference splits max_delay into whole frames
(Filter_buffered_delay), an in-frame integer part (Variable_delay) and a
fractional part (Farrow).  This build keeps round-1's convention of
delaying by floor(max_delay) integer samples total (the RX delay
accounting is calibrated to it); the whole-frame stage engages when the
integer part exceeds one radio frame.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import channel as chn
from dvbs2_tpu.ops import filters


class ChannelState(NamedTuple):
    frame_ring: jnp.ndarray      # (B, D_frames, N, 2) whole-frame FIFO
    int_delay: jnp.ndarray
    frac: jnp.ndarray
    nco: filters.NcoState


def _delay_parts(cfg: Config):
    """Total integer-sample delay -> (whole frames, in-frame samples)."""
    total = max(int(cfg.chn_max_delay), 1)
    n = cfg.rad_frame_size
    frames, samples = divmod(total, n)
    if frames > 0 and samples == 0:
        # keep at least one sample in the variable delay so its state
        # shape stays non-degenerate
        frames, samples = frames - 1, n
    return frames, max(samples, 1)


def init_state(cfg: Config, batch_streams: int = 1) -> ChannelState:
    frames, samples = _delay_parts(cfg)
    n = cfg.rad_frame_size
    return ChannelState(
        frame_ring=jnp.zeros((batch_streams, frames, n, 2), jnp.float32),
        int_delay=jnp.zeros((batch_streams, samples, 2), jnp.float32),
        frac=jnp.zeros((batch_streams, 3, 2), jnp.float32),
        nco=filters.NcoState(n=jnp.float32(0.0)),
    )


def impair(x: jnp.ndarray, cfg: Config, state: ChannelState,
           fading_gain: Optional[jnp.ndarray] = None, dyn=None):
    """SYNCHRO impairments (no noise): fading -> frame delay -> int delay ->
    Farrow fractional delay -> CFO mixer.  Returns (y, new_state).

    ``dyn`` = optional traced (cfo, frac_mu) pair overriding the static
    config values: configs sharing the integer delay part then share ONE
    compiled program (the five refs/TX_RX parity configs differ only in
    CFO 0/0.05 and frac delay 0.0/0.5 — tools/parity_full.py)."""
    frames, samples = _delay_parts(cfg)
    y = x
    if fading_gain is not None:
        g = jnp.asarray(fading_gain, jnp.float32)
        y = y * g.reshape(g.shape + (1,) * (y.ndim - g.ndim))
    if frames > 0:
        ring = state.frame_ring
        out = ring[:, 0]
        ring = jnp.concatenate([ring[:, 1:], y[:, None]], axis=1)
        y = out
    else:
        ring = state.frame_ring
    y, st_int = filters.integer_delay(y, samples, state.int_delay)
    mu = (cfg.chn_max_delay - int(cfg.chn_max_delay)) if dyn is None \
        else dyn[1]
    y, st_frac = filters.fractional_delay(y, mu, state.frac)
    if dyn is not None:
        y, nco = filters.cfo_mix(y, dyn[0], state.nco)
    elif cfg.chn_max_freq_shift != 0.0:
        y, nco = filters.cfo_mix(y, cfg.chn_max_freq_shift, state.nco)
    else:
        nco = state.nco
    return y, ChannelState(frame_ring=ring, int_delay=st_int,
                           frac=st_frac, nco=nco)


def add_noise(key: jax.Array, x: jnp.ndarray, sigma, cfg: Config,
              user_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Noise stage per --chn-type (reference: DVBS2.cpp:593-613)."""
    if cfg.chn_type in ("AWGN", "SYNCHRO"):
        return chn.awgn(key, x, jnp.asarray(sigma, jnp.float32))
    if cfg.chn_type == "USER_ADD":
        if user_noise is None:
            raise ValueError("chn_type USER_ADD needs noise samples "
                             "(--chn-path)")
        return x + jnp.asarray(user_noise, x.dtype)
    raise ValueError(f"unknown chn_type {cfg.chn_type!r}")


def apply(key: jax.Array, x: jnp.ndarray, sigma, cfg: Config,
          state: Optional[ChannelState] = None,
          fading_gain: Optional[jnp.ndarray] = None,
          user_noise: Optional[jnp.ndarray] = None, dyn=None):
    """Full TX_RX-chain channel: impairments (always bound, like the
    reference's TX_RX graph) then the --chn-type noise stage."""
    if state is None:
        state = init_state(cfg, x.shape[0])
    y, state = impair(x, cfg, state, fading_gain=fading_gain, dyn=dyn)
    return add_noise(key, y, sigma, cfg, user_noise=user_noise), state
