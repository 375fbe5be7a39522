"""Mapper / soft demapper (equivalent of aff3ct Modem_generic_fast +
Constellation_user; reference: src/common/Factory/DVBS2/DVBS2.cpp:478-488).

Mapping: consecutive ``bps`` bits form the constellation index, first bit =
LSB (aff3ct Modem_generic index convention; determined EMPIRICALLY against
refs/TX_RX_BB — see tools/itl_probe.py + itl_probe.json: with the .mod
tables and the column interleaver, first-bit-=-MSB costs 1.8-43x FER at
8PSK/16APSK while QPSK is insensitive, and first-bit-=-LSB lands on the
reference curves; the two conventions are equivalent to relabeling the
interleaver read order, so the interleaver keeps the standard's
TOP_LEFT/TOP_RIGHT semantics and the modem owns the bit order).
Demapping produces one LLR per bit, LLR = log P(b=0|y) - log P(b=1|y)
(positive LLR => bit 0, the aff3ct sign convention), computed with the exact
max-star (logsumexp, the reference's default) or the max approximation, with
per-real-dimension noise std sigma (complex noise variance 2 sigma^2).

TPU-native: symbols are split re/im (..., 2) float arrays (no complex dtype on
device); both directions are dense computations over the (small) constellation
— a (F, N_sym, 2^bps) distance tensor on the VPU; no loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.data.constellations import get_constellation
from dvbs2_tpu.ops import cplx

_BPS = {"QPSK": 2, "8PSK": 3, "16APSK": 4}


def _bit_masks(bps: int) -> np.ndarray:
    """(bps, 2**bps) 0/1 matrix: bit k (LSB first) of each index."""
    idx = np.arange(1 << bps)
    return np.stack([(idx >> k) & 1 for k in range(bps)])


def modulate(bits: jnp.ndarray, mod: str) -> jnp.ndarray:
    """(..., N) bits -> (..., N/bps, 2) re/im symbols.

    One-hot x constellation matmul rather than a table gather: gathers into
    a (2^bps, 2) table force a 64x-padded layout on TPU (the last axis of 2
    occupies 2 of 128 lanes); the tiny matmul fuses cleanly instead.
    """
    cstl = jnp.asarray(cplx.from_np(get_constellation(mod)))   # (2^bps, 2)
    bps = _BPS[mod]
    b = bits.reshape(bits.shape[:-1] + (-1, bps)).astype(jnp.int32)
    weights = jnp.asarray(2 ** np.arange(bps), dtype=jnp.int32)
    idx = jnp.sum(b * weights, axis=-1)
    onehot = jax.nn.one_hot(idx, 1 << bps, dtype=jnp.float32)
    return jnp.einsum("...k,kc->...c", onehot, cstl)


def demodulate(y: jnp.ndarray, sigma: jnp.ndarray, mod: str,
               max_star: bool = True) -> jnp.ndarray:
    """(..., N_sym, 2) symbols + per-frame sigma -> (..., N_sym*bps) LLRs.

    ``sigma`` broadcasts over the leading (frame) axes; pass shape (F, 1).
    """
    cstl = jnp.asarray(cplx.from_np(get_constellation(mod)))   # (2^bps, 2)
    bps = _BPS[mod]
    if mod == "QPSK" and max_star:
        # Gray QPSK decouples per axis and the 2-point logsumexp ratio is
        # exactly linear: LLR_b = 2*a*y_axis/sigma^2 with a = |Re c_0|
        # (bit0 <- re, bit1 <- im per the mapper's index order).  Equal to
        # the generic path to f32 roundoff (~1e-6; pinned in
        # tests/test_modem.py) at ~6x less work — the logsumexp form was
        # ~12 ms of the bench step (tools/probe_decode.py).
        a = jnp.abs(cstl[0, 0])
        g = (2.0 * a) / (sigma * sigma)
        return (y * g[..., None]).reshape(y.shape[:-2] + (-1,))
    masks = jnp.asarray(_bit_masks(bps), dtype=bool)           # (bps, 2^bps)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    # metric m_c = -|y - c|^2 / (2 sigma^2): (..., N_sym, 2^bps)
    diff_r = y[..., 0:1] - cstl[:, 0]
    diff_i = y[..., 1:2] - cstl[:, 1]
    d2 = diff_r * diff_r + diff_i * diff_i
    metric = -d2 * inv_2s2[..., None]
    reduce = jax.nn.logsumexp if max_star else (lambda m, axis: jnp.max(m, axis=axis))
    llr = jnp.stack(
        [reduce(jnp.where(~masks[k], metric, -jnp.inf), axis=-1)
         - reduce(jnp.where(masks[k], metric, -jnp.inf), axis=-1)
         for k in range(bps)], axis=-1)                        # (..., N_sym, bps)
    return llr.reshape(llr.shape[:-2] + (-1,))
