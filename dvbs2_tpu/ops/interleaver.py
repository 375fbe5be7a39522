"""DVB-S2 bit interleaver (EN 302 307 §5.3.3) as a static permutation.

Reference behavior: ``Interleaver_core_NO`` for QPSK,
``Interleaver_core_column_row`` with n_cols=bps and TOP_LEFT/TOP_RIGHT read
order for 8PSK/16APSK (reference: src/common/Factory/DVBS2/DVBS2.cpp:451-476).
Bits are written column-wise into an (n_rows x n_cols) array and read
row-wise; TOP_RIGHT reads columns right-to-left (used by 8PSK-S_3/5).

TPU-native: the permutation is a compile-time index vector; interleave and
deinterleave are single static gathers (free to fuse into neighbours).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def permutation(n: int, n_cols: int, read_order: str) -> np.ndarray:
    """pi such that interleaved[k] = natural[pi[k]]."""
    if n_cols == 1:
        return np.arange(n, dtype=np.int32)
    n_rows = n // n_cols
    cols = np.arange(n_cols)
    if read_order == "TOP_RIGHT":
        cols = cols[::-1]
    # out[r*n_cols + j] = in[cols[j]*n_rows + r]
    pi = (cols[None, :] * n_rows + np.arange(n_rows)[:, None]).reshape(-1)
    return pi.astype(np.int32)


def interleave(bits: jnp.ndarray, n_cols: int, read_order: str) -> jnp.ndarray:
    if n_cols == 1:
        return bits
    n = bits.shape[-1]
    n_rows = n // n_cols
    # out[r*n_cols + j] = in[cols[j]*n_rows + r]: reshape/transpose, no gather
    x = bits.reshape(bits.shape[:-1] + (n_cols, n_rows))
    if read_order == "TOP_RIGHT":
        x = jnp.flip(x, axis=-2)
    return jnp.swapaxes(x, -1, -2).reshape(bits.shape[:-1] + (n,))


def deinterleave(llrs: jnp.ndarray, n_cols: int, read_order: str) -> jnp.ndarray:
    if n_cols == 1:
        return llrs
    n = llrs.shape[-1]
    n_rows = n // n_cols
    x = llrs.reshape(llrs.shape[:-1] + (n_rows, n_cols))
    x = jnp.swapaxes(x, -1, -2)
    if read_order == "TOP_RIGHT":
        x = jnp.flip(x, axis=-2)
    return x.reshape(llrs.shape[:-1] + (n,))
