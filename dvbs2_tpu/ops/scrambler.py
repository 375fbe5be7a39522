"""DVB-S2 scramblers, TPU-native.

Both scramblers restart from a fixed seed every frame, so on TPU they are a
single XOR / complex-multiply with a precomputed constant sequence — no
sequential LFSR on the device.

- BB scrambler (EN 302 307 §5.2.4): 15-bit LFSR, feedback = s14^s13, init
  100101010000000, output = input XOR feedback stream. Behavior matches
  reference src/common/Module/Scrambler/Scrambler_BB/Scrambler_BB.hxx:50-64
  (descramble == scramble).
- PL scrambler (EN 302 307 §5.5.4): per-symbol multiply by (-j)^{R(n)} over the
  payload (the 90-symbol PLHEADER is skipped). R(n) derives from two m-sequences
  of degree 18 (Gold construction). The reference ships R(n) as a precomputed
  8190-entry table (src/common/Module/Scrambler/Scrambler_PL/Scrambler_PL.hpp);
  here it is generated from the standard's LFSR definitions and checked against
  the reference table's prefix in tests/test_scrambler.py.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_GOLD_LEN = (1 << 18) - 1


@functools.lru_cache(maxsize=None)
def bb_scramble_sequence(n: int) -> np.ndarray:
    """First ``n`` bits of the baseband scrambling stream (int8)."""
    lfsr = np.array([1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0], dtype=np.int8)
    out = np.empty(n, dtype=np.int8)
    for i in range(n):
        fb = (lfsr[14] + lfsr[13]) & 1
        lfsr[1:] = lfsr[:-1]
        lfsr[0] = fb
        out[i] = fb
    return out


def bb_scramble(bits: jnp.ndarray) -> jnp.ndarray:
    """XOR a (..., K) bit array with the BB scrambling stream (involutive)."""
    seq = jnp.asarray(bb_scramble_sequence(bits.shape[-1]))
    return jnp.bitwise_xor(bits, seq)


@functools.lru_cache(maxsize=None)
def _gold_z(n_needed: int) -> np.ndarray:
    """z(i) = x(i) XOR y(i) for the PL scrambler's two m-sequences."""
    x = np.zeros(18, dtype=np.uint8)
    x[0] = 1
    y = np.ones(18, dtype=np.uint8)
    z = np.empty(n_needed, dtype=np.uint8)
    for i in range(n_needed):
        z[i] = x[0] ^ y[0]
        xf = x[7] ^ x[0]
        yf = y[10] ^ y[7] ^ y[5] ^ y[0]
        x[:-1] = x[1:]
        x[-1] = xf
        y[:-1] = y[1:]
        y[-1] = yf
    return z


@functools.lru_cache(maxsize=None)
def pl_scramble_rn(n: int) -> np.ndarray:
    """R(i) in {0,1,2,3} for i < n (EN 302 307 §5.5.4, sequence index n=0)."""
    need = n + (1 << 17)
    z = _gold_z(need)
    return (2 * z[(np.arange(n) + (1 << 17)) % _GOLD_LEN] + z[:n]).astype(np.int8)


@functools.lru_cache(maxsize=None)
def _pl_factors(n_payload: int) -> np.ndarray:
    """Complex scrambling factors j^{R(n)} for the payload symbols
    (reference: Scrambler_PL.hxx:59-77 — scramble multiplies by
    C(R) in [1, j, -1, -j]; descramble by the conjugate)."""
    rn = pl_scramble_rn(n_payload).astype(np.int64)
    return np.exp(1j * np.pi / 2 * rn)


def pl_scramble(symbols: jnp.ndarray, start: int = 90,
                descramble: bool = False) -> jnp.ndarray:
    """Scramble a (..., pl_frame, 2) re/im symbol array after ``start``.

    ``descramble=True`` multiplies by the conjugate sequence instead.
    """
    from dvbs2_tpu.ops import cplx
    n_payload = symbols.shape[-2] - start
    fac = _pl_factors(n_payload)
    if descramble:
        fac = np.conj(fac)
    fac_full = np.concatenate([np.ones(start, dtype=np.complex128), fac])
    return cplx.mul(symbols, jnp.asarray(cplx.from_np(fac_full)))
