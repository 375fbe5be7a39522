import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.ops import cplx, filters


def test_rrc_taps_properties():
    taps = filters.rrc_taps(0.2, 2, 20)
    assert taps.shape == (81,)                     # 2*20*2+1
    np.testing.assert_allclose(np.sum(taps**2), 1.0, rtol=1e-6)  # unit energy
    np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)      # symmetric
    assert taps[40] == taps.max()                  # peak at center
    # center value matches the closed form (1 - b + 4b/pi)/sqrt(E)
    expect_center = 1 - 0.2 + 4 * 0.2 / np.pi
    assert abs(taps[40] * np.sqrt(1.0) / taps[40] - 1) < 1e-6
    assert expect_center > 0


def test_fir_matches_numpy_convolve():
    rng = np.random.RandomState(0)
    x = cplx.from_np(rng.randn(2, 200) + 1j * rng.randn(2, 200))
    taps = rng.randn(11).astype(np.float32)
    y, st = filters.fir(jnp.asarray(x), taps)
    ref = np.stack([np.convolve(x[b, :, c], taps)[:200]
                    for b in range(2) for c in range(2)]).reshape(2, 2, 200)
    np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)
    assert st.shape == (2, 10, 2)


def test_fir_streaming_equals_batch():
    """Filtering in two chunks with carried state == filtering at once."""
    rng = np.random.RandomState(1)
    x = cplx.from_np(rng.randn(1, 300) + 1j * rng.randn(1, 300))
    taps = filters.rrc_taps()
    full, _ = filters.fir(jnp.asarray(x), taps)
    y1, st = filters.fir(jnp.asarray(x[:, :150]), taps)
    y2, _ = filters.fir(jnp.asarray(x[:, 150:]), taps, st)
    np.testing.assert_allclose(np.concatenate([y1, y2], axis=1),
                               np.asarray(full), rtol=1e-4, atol=1e-5)


def test_upfir_matches_zero_stuffed_fir():
    rng = np.random.RandomState(2)
    x = cplx.from_np(rng.randn(1, 100) + 1j * rng.randn(1, 100))
    taps = filters.rrc_taps()
    up, _ = filters.upfir(jnp.asarray(x), taps, osf=2)
    assert up.shape == (1, 200, 2)
    # reference: zero-stuff then plain FIR
    stuffed = np.zeros((1, 200, 2), np.float32)
    stuffed[:, ::2] = x
    ref, _ = filters.fir(jnp.asarray(stuffed), taps)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_matched_filter_nyquist_isi_free():
    """UPRRC shaping + matched RRC gives ~ISI-free symbol samples."""
    rng = np.random.RandomState(3)
    n_sym = 256
    syms = (1 - 2 * rng.randint(0, 2, (1, n_sym))).astype(np.float32)
    x = np.zeros((1, n_sym, 2), np.float32)
    x[..., 0] = syms
    taps = filters.rrc_taps(0.2, 2, 20)
    shaped, _ = filters.upfir(jnp.asarray(x), taps, osf=2)
    matched, _ = filters.fir(shaped, taps)
    y = np.asarray(matched)[0, :, 0]
    delay = 2 * 40  # 2 * grp_delay * osf
    recovered = y[delay:delay + 2 * (n_sym - 40):2]
    ref = syms[0, :len(recovered)]
    corr = np.corrcoef(recovered, ref)[0, 1]
    assert corr > 0.999


def test_fractional_delay_linear_ramp():
    """Farrow on a linear ramp reproduces the ramp shifted by ~(2 - mu)."""
    n = 50
    ramp = np.arange(n, dtype=np.float32)
    x = np.zeros((1, n, 2), np.float32)
    x[0, :, 0] = ramp
    mu = 0.3
    y, _ = filters.fractional_delay(jnp.asarray(x), mu)
    got = np.asarray(y)[0, 10:40, 0]
    # interior: piecewise-parabolic interpolator on x[n-3..n];
    # on a linear signal output = x[n - (2 - mu)]
    expect = ramp[10:40] - (2 - mu)
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_integer_delay_stream():
    x = cplx.from_np(np.arange(10) + 0j)[None]
    y, st = filters.integer_delay(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(y)[0, 3:, 0], np.arange(7))
    np.testing.assert_allclose(np.asarray(y)[0, :3, 0], 0)
    y2, _ = filters.integer_delay(jnp.asarray(x), 3, st)
    np.testing.assert_allclose(np.asarray(y2)[0, :3, 0], [7, 8, 9])


def test_cfo_mix_phase_continuity_and_roundtrip():
    rng = np.random.RandomState(4)
    x = cplx.from_np(rng.randn(1, 400) + 1j * rng.randn(1, 400))
    nu = 0.01
    y_full, _ = filters.cfo_mix(jnp.asarray(x), nu)
    y1, st = filters.cfo_mix(jnp.asarray(x[:, :200]), nu)
    y2, _ = filters.cfo_mix(jnp.asarray(x[:, 200:]), nu, st)
    np.testing.assert_allclose(np.concatenate([y1, y2], axis=1),
                               np.asarray(y_full), rtol=1e-4, atol=1e-4)
    # mix then de-mix restores
    back, _ = filters.cfo_mix(y_full, nu, conj=True)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=1e-3)


def test_agc_normalizes_energy():
    rng = np.random.RandomState(5)
    x = cplx.from_np(3.7 * (rng.randn(2, 1000) + 1j * rng.randn(2, 1000)))
    y = filters.agc(jnp.asarray(x))
    e = np.mean(cplx.abs2(np.asarray(y)), axis=1)
    np.testing.assert_allclose(e, 1.0, rtol=0.05)


def test_sequence_multiply():
    rng = np.random.RandomState(6)
    x = cplx.from_np(rng.randn(2, 64) + 1j * rng.randn(2, 64))
    s = cplx.from_np(rng.randn(64) + 1j * rng.randn(64))
    y = np.asarray(filters.sequence_multiply(jnp.asarray(x), jnp.asarray(s)))
    xc = x[..., 0] + 1j * x[..., 1]
    sc = s[..., 0] + 1j * s[..., 1]
    np.testing.assert_allclose(y[..., 0] + 1j * y[..., 1], xc * sc[None],
                               rtol=1e-5, atol=1e-5)


def test_unit_delay():
    a = jnp.asarray(np.random.RandomState(7).randn(1, 8, 2).astype(np.float32))
    b = a * 2
    y1, st = filters.unit_delay(a)
    y2, _ = filters.unit_delay(b, st)
    np.testing.assert_array_equal(np.asarray(y1), 0.0)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(a))


def test_variable_delay_runtime_settable():
    rng = np.random.RandomState(8)
    B, N, D = 2, 32, 8
    x1 = jnp.asarray(rng.randn(B, N, 2).astype(np.float32))
    x2 = jnp.asarray(rng.randn(B, N, 2).astype(np.float32))
    d = jnp.asarray([3, 5], jnp.int32)
    y1, st = filters.variable_delay(x1, d, D)
    y2, _ = filters.variable_delay(x2, d, D, st)
    full = np.concatenate([np.zeros((B, D, 2), np.float32),
                           np.asarray(x1), np.asarray(x2)], axis=1)
    for b, db in enumerate([3, 5]):
        np.testing.assert_allclose(np.asarray(y1)[b], full[b, D - db:D - db + N])
        np.testing.assert_allclose(np.asarray(y2)[b],
                                   full[b, D - db + N:D - db + 2 * N])
    # delay can change between calls without recompilation semantics issues
    d2 = jnp.asarray([0, 7], jnp.int32)
    y3, _ = filters.variable_delay(x1, d2, D, st)
    np.testing.assert_allclose(np.asarray(y3)[0], np.asarray(x1)[0])


def test_cfo_mix_traced_matches_static_nonmultiple_nu():
    """ONE quantization rule in both cfo_mix paths (nearest 1e-6 in f32):
    a raw, un-prequantized traced nu must produce exactly the same mixer
    output as the same nu passed statically, including for nu that is NOT
    a 1e-6 multiple.  quantize_nu must also be the exact host mirror of
    the traced rule (round-4 advisor: enforce one rule, don't document
    two)."""
    import jax

    for nu in (0.05, 0.0500007, 0.0499993, 0.1234567891, 7.5e-7):
        x = jnp.stack([jnp.ones((1, 64)), jnp.zeros((1, 64))], axis=-1)
        y_static, _ = filters.cfo_mix(x, nu)
        # raw traced value — no host prequantization required any more
        y_traced, _ = jax.jit(filters.cfo_mix)(x, jnp.float32(nu))
        np.testing.assert_allclose(np.asarray(y_static),
                                   np.asarray(y_traced), atol=1e-6)
        # host mirror is bit-identical to the traced rule
        nu_q = filters.quantize_nu(nu)
        tr = float(jnp.round(jnp.float32(nu) * 1e6) / 1e6)
        assert nu_q == tr
    # 1e-6 multiples (every shipped reference config) keep the reference's
    # double-floor value at the f32 precision the mixer runs in
    assert np.float32(filters.quantize_nu(0.05)) == np.float32(0.05)
    assert filters.quantize_nu(0.0) == 0.0


def test_fir_mm_matches_fir():
    """The banded-matmul multi-filter FIR (MXU form) must match n_filt
    independent fir() calls to f32 round-off, including the carried
    streaming state across chained blocks."""
    rng = np.random.RandomState(9)
    taps1 = rng.randn(89).astype(np.float32)
    taps2 = (rng.randint(0, 3, 89) - 1).astype(np.float32)
    x1 = jnp.asarray(rng.randn(3, 700, 2), jnp.float32)
    x2 = jnp.asarray(rng.randn(3, 700, 2), jnp.float32)

    y_mm, st_mm = filters.fir_mm(x1, np.stack([taps1, taps2]))
    y1, st1 = filters.fir(x1, taps1)
    y2, _ = filters.fir(x1, taps2)
    np.testing.assert_allclose(np.asarray(y_mm[0]), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y_mm[1]), np.asarray(y2),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st_mm), np.asarray(st1),
                               atol=0, rtol=0)
    # streaming continuation
    y_mm2, _ = filters.fir_mm(x2, np.stack([taps1, taps2]), st_mm)
    y1b, _ = filters.fir(x2, taps1, st1)
    np.testing.assert_allclose(np.asarray(y_mm2[0]), np.asarray(y1b),
                               atol=2e-4, rtol=1e-4)
    # short blocks (N < block) and single filter
    xs = jnp.asarray(rng.randn(2, 40, 2), jnp.float32)
    ys, _ = filters.fir_mm(xs, taps1[None])
    yr, _ = filters.fir(xs, taps1)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(yr),
                               atol=2e-4, rtol=1e-4)


def test_upfir_mm_matches_upfir():
    """The polyphase MXU shaping filter is a drop-in for upfir: same
    output to f32 round-off, same carried state, across chained blocks."""
    rng = np.random.RandomState(12)
    taps = filters.rrc_taps()
    x1 = jnp.asarray(rng.randn(2, 150, 2), jnp.float32)
    x2 = jnp.asarray(rng.randn(2, 150, 2), jnp.float32)
    a1, s_a = filters.upfir(x1, taps, 2)
    b1, s_b = filters.upfir_mm(x1, taps, 2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    a2, _ = filters.upfir(x2, taps, 2, s_a)
    b2, _ = filters.upfir_mm(x2, taps, 2, s_b)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                               atol=2e-5, rtol=1e-4)
