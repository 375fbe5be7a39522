import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.ops import ldpc
from dvbs2_tpu.ops import ldpc_pallas


@pytest.mark.slow
@pytest.mark.parametrize("rate", ["8/9"])
def test_pallas_matches_jnp_decoder(rate):
    """Interpret-mode kernel == jnp compressed-MS decoder (same math)."""
    rng = np.random.RandomState(0)
    F = 4
    llr = jnp.asarray(rng.randn(F, 16200).astype(np.float32) * 3)
    ref = ldpc.decode(llr, rate, n_ite=2, implem="NMS", norm_factor=0.875)
    out = ldpc_pallas.decode_nms(llr, rate, n_ite=2, norm_factor=0.875,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pallas_corrects_noise():
    from dvbs2_tpu.data.ldpc_tables import get_table
    rate = "8/9"
    t = get_table(rate)
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, (1, t.K)).astype(np.int8)
    cw = np.asarray(ldpc.encode(jnp.asarray(bits), rate))
    sigma = float(np.sqrt(1.0 / (2 * (t.K / 16200) * 10 ** 0.65)))  # ~6.5 dB
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + sigma * rng.randn(*x.shape).astype(np.float32)
    llr = 2.0 * y / sigma**2
    post = ldpc_pallas.decode_nms(jnp.asarray(llr), rate, n_ite=8,
                                  interpret=True)
    hard = np.asarray(ldpc.hard_decision(post))
    np.testing.assert_array_equal(hard[:, :t.K], bits)
