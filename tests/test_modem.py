import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.data.constellations import get_constellation
from dvbs2_tpu.ops import cplx, interleaver, modem


@pytest.mark.parametrize("mod", ["QPSK", "8PSK", "16APSK"])
def test_unit_energy(mod):
    c = get_constellation(mod)
    np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 1.0, rtol=1e-6)


@pytest.mark.parametrize("mod", ["QPSK", "8PSK", "16APSK"])
def test_mod_demod_roundtrip(mod):
    bps = {"QPSK": 2, "8PSK": 3, "16APSK": 4}[mod]
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, (3, 60 * bps)).astype(np.int8)
    sym = modem.modulate(jnp.asarray(bits), mod)
    llr = modem.demodulate(sym, jnp.full((3, 1), 0.05), mod)
    hard = (np.asarray(llr) < 0).astype(np.int8)
    np.testing.assert_array_equal(hard, bits)


def test_demod_llr_sign_and_scale_qpsk():
    """Analytic check: QPSK Gray -> per-bit LLR = 2*sqrt(2)*y/(2 sigma^2)...
    for the I-rail bit with unit-energy constellation (+-1/sqrt2)."""
    sigma = 0.3
    y = cplx.from_np(np.array([[0.2 + 0.5j]]))
    llr = np.asarray(modem.demodulate(jnp.asarray(y), jnp.full((1, 1), sigma),
                                      "QPSK"))
    a = 1 / np.sqrt(2)
    # with idx = b0 + 2*b1 over [(1,1),(-1,1),(1,-1),(-1,-1)]/sqrt2
    # (first bit = LSB, the aff3ct Modem_generic convention — see
    # ops/modem.py docstring): b0 selects the real sign, b1 the imag sign
    expect_b0 = (2 * a * 0.2) / sigma ** 2
    expect_b1 = (2 * a * 0.5) / sigma ** 2
    np.testing.assert_allclose(llr[0], [expect_b0, expect_b1], rtol=1e-5)


def test_interleaver_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16200).astype(np.float32)
    for n_cols, order in [(3, "TOP_LEFT"), (3, "TOP_RIGHT"), (4, "TOP_LEFT"),
                          (1, "TOP_LEFT")]:
        itl = interleaver.interleave(jnp.asarray(x), n_cols, order)
        back = interleaver.deinterleave(itl, n_cols, order)
        np.testing.assert_array_equal(np.asarray(back), x)


def test_interleaver_column_row_semantics():
    """Write column-wise, read row-wise (EN 302 307 §5.3.3)."""
    n, n_cols = 12, 3
    x = np.arange(n)
    pi = interleaver.permutation(n, n_cols, "TOP_LEFT")
    out = x[pi]
    # column j = x[j*4:(j+1)*4]; row r read left->right = x[r], x[4+r], x[8+r]
    np.testing.assert_array_equal(out[:3], [0, 4, 8])
    pi_r = interleaver.permutation(n, n_cols, "TOP_RIGHT")
    np.testing.assert_array_equal(x[pi_r][:3], [8, 4, 0])
