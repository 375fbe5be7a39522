"""Channel impairment chain — the `dvbs2_ch` equivalent (reference:
src/mains/CH/main.cpp:44-84: fading -> frame delay -> integer delay ->
fractional delay -> CFO shift -> AWGN; builders DVBS2.cpp:593-685).

Operates on the serialized oversampled stream (1, N, 2); every stage carries
explicit state so consecutive batches form one continuous channel.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import channel as chn
from dvbs2_tpu.ops import filters


class ChannelState(NamedTuple):
    int_delay: jnp.ndarray
    frac: jnp.ndarray
    nco: filters.NcoState


def init_state(cfg: Config, batch_streams: int = 1) -> ChannelState:
    int_d = max(int(cfg.chn_max_delay), 1)
    return ChannelState(
        int_delay=jnp.zeros((batch_streams, int_d, 2), jnp.float32),
        frac=jnp.zeros((batch_streams, 3, 2), jnp.float32),
        nco=filters.NcoState(n=jnp.float32(0.0)),
    )


def apply(key: jax.Array, x: jnp.ndarray, sigma, cfg: Config,
          state: Optional[ChannelState] = None):
    """Impair a (B, N, 2) stream; returns (y, new_state).

    Delay decomposition mirrors the reference: integer part through the
    variable delay, fractional part through the Farrow interpolator
    (reference: TX_RX/main.cpp channel binding at :219-236).
    """
    if state is None:
        state = init_state(cfg, x.shape[0])
    int_d = max(int(cfg.chn_max_delay), 1)
    mu = cfg.chn_max_delay - int(cfg.chn_max_delay)
    y, st_int = filters.integer_delay(x, int_d, state.int_delay)
    y, st_frac = filters.fractional_delay(y, mu, state.frac)
    if cfg.chn_max_freq_shift != 0.0:
        y, nco = filters.cfo_mix(y, cfg.chn_max_freq_shift, state.nco)
    else:
        nco = state.nco
    y = chn.awgn(key, y, jnp.asarray(sigma, jnp.float32))
    return y, ChannelState(int_delay=st_int, frac=st_frac, nco=nco)
