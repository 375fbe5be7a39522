import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import BCH_M, BCH_T
from dvbs2_tpu.ops import bch


def test_gf_tables():
    exp, log = bch.gf_tables()
    assert exp[0] == 1 and exp[1] == 2
    # alpha^16383 == 1 (primitive)
    assert exp[16382] != 1 and len(set(exp[:16383].tolist())) == 16383
    # log/exp inverse
    assert all(log[exp[i]] == i for i in range(0, 16383, 1000))


def test_generator_poly_degree_and_divisibility():
    g = bch.generator_poly()
    assert g.bit_length() - 1 == BCH_M * BCH_T == 168
    # x^16383 - 1 must be divisible by g (g | x^ORDER + 1)
    # polynomial long division of x^16383 + 1 by g over GF(2)
    r = (1 << 16383) | 1
    deg_g = 168
    while r.bit_length() - 1 >= deg_g and r:
        r ^= g << (r.bit_length() - 1 - deg_g)
    assert r == 0


@pytest.mark.parametrize("K", [14232, 9552])
def test_encode_codeword_divisible_by_g(K):
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, (2, K)).astype(np.int8)
    cw = np.array(bch.encode(jnp.asarray(bits), K))
    assert cw.shape == (2, K + 168)
    g = bch.generator_poly()
    for f in range(2):
        # c(x) with c_0 <-> x^{N-1}
        c = 0
        for b in cw[f]:
            c = (c << 1) | int(b)
        while c.bit_length() - 1 >= 168 and c:
            c ^= g << (c.bit_length() - 1 - 168)
        assert c == 0


@pytest.mark.parametrize("n_err", [0, 1, 5, 12])
def test_decode_corrects_up_to_t(n_err):
    K = 14232
    rng = np.random.RandomState(n_err)
    bits = rng.randint(0, 2, (3, K)).astype(np.int8)
    cw = np.array(bch.encode(jnp.asarray(bits), K))
    for f in range(3):
        pos = rng.choice(cw.shape[1], size=n_err, replace=False)
        cw[f, pos] ^= 1
    dec, ok = bch.decode(jnp.asarray(cw), K)
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_decode_flags_beyond_t():
    K = 14232
    rng = np.random.RandomState(99)
    bits = rng.randint(0, 2, (2, K)).astype(np.int8)
    cw = np.array(bch.encode(jnp.asarray(bits), K))
    pos = rng.choice(cw.shape[1], size=20, replace=False)
    cw[0, pos] ^= 1
    dec, ok = bch.decode(jnp.asarray(cw), K)
    ok = np.asarray(ok)
    assert not ok[0] and ok[1]
