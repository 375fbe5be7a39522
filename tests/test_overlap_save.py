"""Sample-axis overlap-save sharding == the sequential streaming FIR."""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.ops import filters
from dvbs2_tpu.parallel import overlap_save


def test_sharded_fir_matches_sequential():
    taps = filters.rrc_taps(0.2, 2, 20)
    key = tuple(float(t) for t in taps)
    fn = overlap_save.sharded_fir(key, 8)
    rng = np.random.RandomState(0)
    B, N = 2, 8 * 256
    carry = jnp.zeros((B, len(taps) - 1, 2), jnp.float32)
    x1 = jnp.asarray(rng.randn(B, N, 2), jnp.float32)
    x2 = jnp.asarray(rng.randn(B, N, 2), jnp.float32)

    y1, c1 = fn(x1, carry)
    y2, c2 = fn(x2, c1)

    r1, s1 = filters.fir(x1, taps)
    r2, s2 = filters.fir(x2, taps, s1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(s2), atol=1e-6)


def test_sharded_rx_frontend_matches_sequential():
    taps = filters.rrc_taps(0.2, 2, 20)
    key = tuple(float(t) for t in taps)
    nu = -0.01
    fn = overlap_save.sharded_rx_frontend(key, nu, 8)
    rng = np.random.RandomState(1)
    B, N = 1, 8 * 128
    carry = jnp.zeros((B, len(taps) - 1, 2), jnp.float32)
    x = jnp.asarray(rng.randn(B, N, 2), jnp.float32)

    y, _ = fn(x, carry, jnp.float32(0.0))

    # sequential: conj CFO mix (multiply by e^{-j 2 pi nu n}) then FIR
    xr, nco = filters.cfo_mix(x, nu, conj=True)
    r, _ = filters.fir(xr, taps)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r),
                               atol=1e-4, rtol=1e-4)
