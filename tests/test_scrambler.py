import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.ops import scrambler

# First 112 values of the reference's precomputed PL scrambling table
# (reference: src/common/Module/Scrambler/Scrambler_PL/Scrambler_PL.hpp:54ff)
# — the standard-defined R(n) sequence used as a golden vector.
PL_RAND_SEQ_PREFIX = [
    0, 1, 1, 1, 1, 3, 1, 3, 1, 3, 1, 3, 1, 3, 3, 3,
    1, 3, 1, 2, 2, 2, 2, 0, 0, 0, 1, 3, 3, 3, 2, 3,
    3, 3, 0, 2, 0, 1, 1, 3, 3, 2, 3, 1, 0, 3, 3, 0,
    3, 1, 2, 2, 3, 2, 0, 2, 0, 1, 0, 1, 3, 0, 0, 0,
    0, 2, 2, 1, 2, 2, 0, 0, 3, 0, 2, 3, 2, 1, 3, 2,
    3, 1, 2, 0, 2, 0, 1, 2, 2, 2, 2, 0, 0, 3, 2, 1,
    3, 2, 2, 2, 2, 1, 0, 1, 3, 0, 3, 1, 2, 1, 3, 3,
]


def test_pl_rand_seq_matches_reference_table():
    rn = scrambler.pl_scramble_rn(len(PL_RAND_SEQ_PREFIX))
    assert rn.tolist() == PL_RAND_SEQ_PREFIX


def test_bb_scramble_involution():
    bits = jnp.asarray(np.random.RandomState(0).randint(0, 2, (3, 14232)),
                       dtype=jnp.int8)
    out = scrambler.bb_scramble(scrambler.bb_scramble(bits))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_bb_sequence_lfsr_reference():
    """Independent bit-by-bit LFSR (poly 1+x^14+x^15, init 100101010000000)."""
    n = 64
    state = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
    expect = []
    for _ in range(n):
        fb = (state[14] + state[13]) % 2
        state = [fb] + state[:-1]
        expect.append(fb)
    assert scrambler.bb_scramble_sequence(n).tolist() == expect


def test_pl_scramble_roundtrip_and_header_passthrough():
    from dvbs2_tpu.ops import cplx
    rng = np.random.RandomState(1)
    x = cplx.from_np(rng.randn(2, 8370) + 1j * rng.randn(2, 8370))
    y = scrambler.pl_scramble(jnp.asarray(x))
    z = scrambler.pl_scramble(y, descramble=True)
    np.testing.assert_allclose(np.asarray(z), x, rtol=1e-5, atol=1e-5)
    # PLHEADER (first 90 symbols) untouched
    np.testing.assert_array_equal(np.asarray(y)[:, :90], x[:, :90])
    # payload actually scrambled
    assert not np.allclose(np.asarray(y)[:, 90:], x[:, 90:])


def test_pl_scramble_factor_values():
    """R=0..3 -> multiply by 1, j, -1, -j (Scrambler_PL.hxx:59-77)."""
    fac = scrambler._pl_factors(4)
    rn = scrambler.pl_scramble_rn(4)
    expect = np.array([1, 1j, -1, -1j])[rn]
    np.testing.assert_allclose(fac, expect, atol=1e-12)
