import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.data.ldpc_tables import get_table, validate_table
from dvbs2_tpu.ops import ldpc


@pytest.mark.parametrize("rate", ["3/5", "8/9"])
def test_table_structure(rate):
    t = get_table(rate)
    validate_table(t)
    exp_groups = {"3/5": 27, "8/9": 40}[rate]
    assert t.n_groups == exp_groups


@pytest.mark.parametrize("rate", ["3/5", "8/9"])
def test_structs(rate):
    s = ldpc.build_structs(rate)
    t = get_table(rate)
    # every table edge appears exactly once across the layers
    n_edges = sum(len(e) for e in s.layer_edges)
    assert n_edges == sum(len(r) for r in t.rows)
    assert s.max_dc <= 30
    for r in range(s.q):
        for (g, sh) in s.layer_edges[r]:
            assert 0 <= g < s.n_groups and 0 <= sh < 360
            assert (sh * s.q + r) in t.rows[g]


@pytest.mark.parametrize("rate", ["3/5", "8/9"])
def test_encode_zero_syndrome(rate):
    t = get_table(rate)
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, (3, t.K)).astype(np.int8)
    cw = ldpc.encode(jnp.asarray(bits), rate)
    assert cw.shape == (3, 16200)
    w = np.asarray(ldpc.syndrome_weight(cw, rate))
    np.testing.assert_array_equal(w, 0)


def test_nonzero_syndrome_detects_errors():
    rate = "8/9"
    t = get_table(rate)
    bits = jnp.zeros((1, t.K), jnp.int8)
    cw = np.array(ldpc.encode(bits, rate))
    cw[0, 7] ^= 1
    assert int(ldpc.syndrome_weight(jnp.asarray(cw), rate)[0]) > 0


@pytest.mark.parametrize("rate,implem", [("8/9", "SPA"), ("8/9", "NMS"),
                                         ("3/5", "MS")])
def test_decode_corrects_awgn(rate, implem):
    """Codeword + AWGN at a comfortable SNR decodes to zero errors."""
    t = get_table(rate)
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, (4, t.K)).astype(np.int8)
    cw = np.array(ldpc.encode(jnp.asarray(bits), rate))
    # BPSK + AWGN, Eb/N0 comfortable (~4 dB above threshold)
    rate_f = t.K / 16200
    ebn0_db = {"8/9": 6.5, "3/5": 4.5}[rate]
    sigma = float(np.sqrt(1.0 / (2 * rate_f * 10 ** (ebn0_db / 10))))
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + sigma * rng.randn(*x.shape).astype(np.float32)
    llr = 2.0 * y / sigma**2
    post = ldpc.decode(jnp.asarray(llr), rate, n_ite=20, implem=implem,
                       norm_factor=0.85 if implem == "NMS" else 1.0)
    hard = np.asarray(ldpc.hard_decision(post))
    np.testing.assert_array_equal(hard[:, :t.K], bits)


def test_decode_is_jittable():
    rate = "8/9"
    t = get_table(rate)
    llr = jnp.ones((2, 16200), jnp.float32)
    f = jax.jit(lambda x: ldpc.decode(x, rate, n_ite=2))
    out = f(llr)
    assert out.shape == (2, 16200)


def test_group_perm_matches_static_permuted_table():
    """encode/decode with the traced group_perm fast path must match the
    statically permuted '-p<spec>' table bit-for-bit — an argsort/inverse
    mix-up here would silently invalidate the UEP placement-scan artifacts
    (ldpc_place_*.json), so this pins the equivalence (round-3 advisory)."""
    import numpy as np
    from dvbs2_tpu.data import ldpc_tables

    rate = "8/9"
    base = f"{rate}@{ldpc_tables.DEFAULT_VARIANT[rate]}"
    for spec in ("L", "E", "S3"):
        tab = ldpc_tables.get_table(base)
        sigma = jnp.asarray(
            ldpc_tables.placement_order(len(tab.rows),
                                        [len(r) for r in tab.rows], spec),
            jnp.int32)
        key = jax.random.key(hash(spec) % (2**31))
        bits = jax.random.bernoulli(key, 0.5, (2, 14400)).astype(jnp.int8)
        cw_dyn = ldpc.encode(bits, base, group_perm=sigma)
        cw_static = ldpc.encode(bits, f"{base}-p{spec}")
        assert np.array_equal(np.asarray(cw_dyn), np.asarray(cw_static)), spec

        if spec != "L":
            continue   # decode leg once (compiles per static table)
        # decode equivalence on noisy LLRs (no syndrome exit so both run
        # the same fixed iteration count)
        x = 1.0 - 2.0 * cw_static.astype(jnp.float32)
        noise = 0.6 * jax.random.normal(jax.random.fold_in(key, 1),
                                        x.shape)
        llr = 2.0 * (x + noise) / (0.6 ** 2)
        post_dyn = ldpc.decode(llr, base, n_ite=4, implem="NMS",
                               use_pallas="never", syndrome_exit=False,
                               group_perm=sigma)
        post_static = ldpc.decode(llr, f"{base}-p{spec}", n_ite=4,
                                  implem="NMS", use_pallas="never",
                                  syndrome_exit=False)
        np.testing.assert_allclose(np.asarray(post_dyn),
                                   np.asarray(post_static), atol=1e-4,
                                   err_msg=spec)


def test_annexc_recall_candidates_load_and_reject_8_9():
    """Round-5 recall experiment machinery (ANNEXC_RECALL.md): the 3/5
    recalled candidates load as valid tables with the documented
    provenance tag; rate 8/9 has no credible recall and must say so."""
    for v in ("3/5@rc1", "3/5@rc2"):
        t = get_table(v)
        validate_table(t)
        assert t.source.startswith("EN302307-AnnexC-recalled-lowconf")
        assert t.n_groups == 27
    with pytest.raises(ValueError, match="no credible Annex C recall"):
        get_table("8/9@rc1")
