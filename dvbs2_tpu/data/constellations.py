"""Constellations in mapper-index order (reference: conf/mod/*.mod files).

The reference loads these from text files via ``tools::Constellation_user``
(reference: src/mains/TX_RX_BB/main.cpp:44) and operates at unit mean symbol
energy; tables here are normalized to Es=1 explicitly.
"""
from __future__ import annotations

import functools

import numpy as np

_SQRT2 = np.sqrt(2.0)

# conf/mod/4QAM_GRAY.mod (Gray QPSK)
_QPSK = np.array([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j], dtype=np.complex128)

# conf/mod/8PSK.mod
_8PSK = np.array([
    0.707106781 + 0.707106781j, 0 + 1j, -1 + 0j, -0.707106781 + 0.707106781j,
    1 + 0j, 0.707106781 - 0.707106781j, -0.707106781 - 0.707106781j, 0 - 1j,
], dtype=np.complex128)

# conf/mod/16APSK.mod (gamma = 3.15, unit-energy by construction)
_R1 = 0.3065696697424830
_R2_OUT = 0.7970811413304560
_R2_MID_A = 0.2917519466044410
_R2_MID_B = 1.0888330879349000
_16APSK = np.array([
    _R2_OUT + _R2_OUT * 1j, _R2_MID_A + _R2_MID_B * 1j,
    _R2_MID_B + _R2_MID_A * 1j, _R1 + _R1 * 1j,
    -_R2_OUT + _R2_OUT * 1j, -_R2_MID_A + _R2_MID_B * 1j,
    -_R2_MID_B + _R2_MID_A * 1j, -_R1 + _R1 * 1j,
    _R2_OUT - _R2_OUT * 1j, _R2_MID_A - _R2_MID_B * 1j,
    _R2_MID_B - _R2_MID_A * 1j, _R1 - _R1 * 1j,
    -_R2_OUT - _R2_OUT * 1j, -_R2_MID_A - _R2_MID_B * 1j,
    -_R2_MID_B - _R2_MID_A * 1j, -_R1 - _R1 * 1j,
], dtype=np.complex128)


@functools.lru_cache(maxsize=None)
def get_constellation(mod: str) -> np.ndarray:
    """Unit-mean-energy constellation, complex64, in mapper-index order."""
    pts = {"QPSK": _QPSK, "8PSK": _8PSK, "16APSK": _16APSK}[mod]
    pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    return pts.astype(np.complex64)
