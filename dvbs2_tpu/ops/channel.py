"""Channel models (equivalent of aff3ct Channel_AWGN_LLR + the dvbs2 channel
impairment chain; reference: src/common/Factory/DVBS2/DVBS2.cpp:593-613).

aff3ct sigma convention: ``sigma`` is the noise std per REAL dimension, so a
complex sample receives sigma*(n_r + j n_i) with unit-variance normals
(tools::esn0_to_sigma). Monte-Carlo noise comes from the JAX threefry PRNG
(counter-based: reproducible and splittable across the device mesh — the
TPU-native replacement for the reference's per-thread MT19937 seeds).

Symbols are split re/im (..., 2) float32 arrays (no complex dtype on device),
so AWGN is simply iid normal noise over the whole array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(key: jax.Array, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Add AWGN with per-real-dim std ``sigma`` to a (..., 2) re/im array."""
    n = jax.random.normal(key, x.shape, dtype=jnp.float32)
    return x + jnp.asarray(sigma, jnp.float32) * n
