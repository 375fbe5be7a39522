"""Complex arithmetic on split re/im float arrays.

The axon TPU backend has no complex dtype support (device transfers of
complex64 raise UNIMPLEMENTED), and split planes are the TPU-friendly layout
anyway (the reference's interleaved-float I/Q buffers become a trailing
(..., 2) axis here; SURVEY.md §7). All device-side "complex" arrays in this
framework are real arrays whose LAST axis has size 2 = (re, im). Host-side
numpy may use complex128/64 freely for precomputing constants; convert at the
boundary with :func:`from_np` / :func:`to_np`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def from_np(x: np.ndarray) -> np.ndarray:
    """Host complex ndarray -> real (..., 2) float32 ndarray."""
    return np.stack([np.real(x), np.imag(x)], axis=-1).astype(np.float32)


def to_np(x) -> np.ndarray:
    """Device/host real (..., 2) array -> host complex64 ndarray."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise complex multiply of (..., 2) arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def mul_conj(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * conj(b) on (..., 2) arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br + ai * bi, ai * br - ar * bi], axis=-1)


def conj(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def abs2(a: jnp.ndarray) -> jnp.ndarray:
    """|a|^2, shape (...)."""
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]


def scale(a: jnp.ndarray, s) -> jnp.ndarray:
    """Multiply by a real scalar/broadcastable factor."""
    return a * jnp.asarray(s)[..., None]
