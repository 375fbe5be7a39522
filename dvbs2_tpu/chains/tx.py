"""Full TX chain with pulse shaping — the `dvbs2_tx` equivalent (reference:
src/mains/TX/main.cpp:70-78: source -> bb_scr..pl_scr -> shaping -> radio).

Each of B independent streams serializes its F frames into one oversampled
waveform (frames consecutive in time, like the reference's streaming
pipeline); the UPRRC polyphase shaping state is carried across calls so
back-to-back batches form a continuous waveform per stream.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains.txrx_bb import tx_bb
from dvbs2_tpu.ops import filters


class TxState(NamedTuple):
    shp: jnp.ndarray   # (B, hist, 2) UPRRC history


def tx_stream(bits: jnp.ndarray, cfg: Config,
              state: Optional[TxState] = None):
    """(B, F, K_bch) info bits -> ((B, F*L*osf, 2) waveform, TxState)."""
    B, F, K = bits.shape
    pl = tx_bb(bits.reshape(B * F, K), cfg)               # (B*F, L, 2)
    stream = pl.reshape(B, F * cfg.pl_frame_size, 2)
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    shaped, shp_state = filters.upfir_mm(
        stream, taps, cfg.shp_osf, None if state is None else state.shp)
    return shaped, TxState(shp=shp_state)
