"""Blocked (ULTRA) Gardner vs the exact per-sample scan (reference:
Synchronizer_Gardner_ultra_osf2.cpp:60-105 vs Synchronizer_Gardner_fast.cpp).

In steady lock the blocked variant must produce the same strobe pattern and
near-identical interpolated symbols; its only approximation is the
frozen-mu Farrow interpolation inside each hold block."""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains.tx import tx_stream
from dvbs2_tpu.ops import filters, sync


def _locked_stream(cfg, B, n_frames, frac=0.5, seed=0):
    """Shaped TX stream -> fractional delay -> matched filter, plus an
    exact-scan warmup to put the Gardner into steady lock."""
    key = jax.random.key(seed)
    bits = jax.random.bernoulli(key, 0.5,
                                (B, n_frames, cfg.K_bch)).astype(jnp.int8)
    x, _ = tx_stream(bits, cfg)
    x, _ = filters.fractional_delay(x, frac)
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    y, _ = filters.fir(x, taps)
    warm = cfg.pl_frame_size * cfg.shp_osf      # one frame of pull-in
    _, _, st = sync.gardner_scan(y[:, :warm], cfg)
    return y[:, warm:], st


def test_blocked_matches_exact_in_lock():
    cfg = Config(modcod="QPSK-S_8/9")
    stream, st0 = _locked_stream(cfg, B=2, n_frames=3)
    N = (stream.shape[1] // 101) * 101
    stream = stream[:, :N]

    y_e, s_e, st_e = jax.jit(
        lambda x, s: sync.gardner_scan(x, cfg, s))(stream, st0)
    y_b, s_b, st_b = jax.jit(
        lambda x, s: sync.gardner_scan_blocked(x, cfg, s))(stream, st0)

    # identical strobe decisions in lock
    agree = float(jnp.mean((s_e == s_b).astype(jnp.float32)))
    assert agree == 1.0, f"strobe agreement {agree}"
    # symbols match to frozen-mu interpolation error at the strobes
    mask = (s_e > 0)[..., None]
    err = float(jnp.max(jnp.abs(jnp.where(mask, y_e - y_b, 0.0))))
    scale = float(jnp.max(jnp.abs(y_e)))
    assert err < 0.02 * scale, f"strobed symbol error {err} vs scale {scale}"
    # carried loop state stays in agreement
    assert float(jnp.max(jnp.abs(st_e.mu - st_b.mu))) < 5e-3
    assert float(jnp.max(jnp.abs(st_e.nco - st_b.nco))) < 5e-3
    assert float(jnp.max(jnp.abs(st_e.lf_prev - st_b.lf_prev))) < 1e-4


def test_step2_matches_generic():
    """The osf=2 gather-free gardner_step2 must be bit-equivalent to the
    generic masked-update state machine on a random state trajectory."""
    cfg = Config()
    kp, ki = sync.gardner_gains(cfg)
    B = 4
    key = jax.random.key(9)
    st0 = sync.gardner_init(B, 2)._replace(
        nco=jax.random.uniform(key, (B,)),
        mu=jax.random.uniform(jax.random.fold_in(key, 1), (B,)))
    xs = jax.random.normal(jax.random.fold_in(key, 2), (400, B, 2))

    @jax.jit
    def run_both(st0, xs):
        def step(c, xi):
            sa, sb = c
            sa, ya, ka = sync._gardner_step_generic(sa, xi, kp, ki, 2)
            sb, yb, kb = sync.gardner_step2(sb, xi, kp, ki)
            return (sa, sb), (ya, ka, yb, kb)
        return jax.lax.scan(step, (st0, st0), xs)

    (st_a, st_b), (ya, ka, yb, kb) = run_both(st0, xs)
    assert bool(jnp.all(ka == kb))
    assert float(jnp.max(jnp.abs(ya - yb))) < 1e-6
    for fa, fb in zip(st_a, st_b):
        assert float(jnp.max(jnp.abs(
            fa.astype(jnp.float32) - fb.astype(jnp.float32)))) < 1e-5


def test_blocked_hold_picker():
    assert sync._pick_hold(16740, 101) in range(16, 513)
    assert 16740 % sync._pick_hold(16740, 101) == 0
    assert 89568 % sync._pick_hold(89568, 101) == 0


def test_blocked_carry_continuity():
    """Splitting a stream across two blocked calls equals one call."""
    cfg = Config(modcod="QPSK-S_8/9")
    stream, st0 = _locked_stream(cfg, B=1, n_frames=2, seed=1)
    N = (stream.shape[1] // (2 * 101)) * (2 * 101)
    stream = stream[:, :N]
    y1, s1, st1 = sync.gardner_scan_blocked(stream, cfg, st0)
    ya, sa, sta = sync.gardner_scan_blocked(stream[:, :N // 2], cfg, st0)
    yb, sb, stb = sync.gardner_scan_blocked(stream[:, N // 2:], cfg, sta)
    assert np.array_equal(np.asarray(s1),
                          np.asarray(jnp.concatenate([sa, sb], axis=1)))
    full = jnp.concatenate([ya, yb], axis=1)
    assert float(jnp.max(jnp.abs(y1 - full))) < 1e-5


def test_blocked_pending_wrap_at_block_entry():
    """Regression for the round-3 ULTRA FER floor at integer-sample delays
    (mu wrap boundary): when the NCO wraps right at a block boundary the
    carried mu is stale by a FULL sample (mu refreshes only at strobes).
    A frozen-mu body then emits an entire block of midpoint samples
    (diagnosed via tools/diag_ultra_wrap.py); the fix derives the body mu
    from the NCO (mu0 = nco/W).  Start both machines in the exact pending-
    wrap state and require symbol agreement through the block."""
    cfg = Config(modcod="QPSK-S_8/9")
    stream, st0 = _locked_stream(cfg, B=2, n_frames=2, frac=0.0, seed=3)
    N = 4 * 101
    stream = stream[:, :N]
    # the bug state: NCO already wrapped (just below 0 -> strobe with
    # mu ~ 0 due), carried mu still ~1, last two samples non-strobes
    st0 = st0._replace(
        mu=jnp.full_like(st0.mu, 1.0),
        nco=jnp.full_like(st0.nco, -1e-4),
        history=jnp.zeros_like(st0.history))

    y_e, s_e, _ = sync.gardner_scan(stream, cfg, st0)
    y_b, s_b, _ = sync.gardner_scan_blocked(stream, cfg, st0)

    # both must emit the same symbols at their strobes (allow a +-1
    # count transient at block boundaries)
    for b in range(2):
        se = np.asarray(s_e[b]) > 0
        sb = np.asarray(s_b[b]) > 0
        ve = np.asarray(y_e[b])[se]
        vb = np.asarray(y_b[b])[sb]
        n = min(len(ve), len(vb))
        assert abs(len(ve) - len(vb)) <= 1
        err = np.max(np.abs(ve[:n] - vb[:n]))
        scale = np.max(np.abs(ve))
        assert err < 0.05 * scale, f"stream {b}: err {err} vs {scale}"


def test_extract_fast_matches_scatter():
    """extract_strobed_fast (dense masked-shift compaction) must be
    bit-equivalent to the scatter-based extract_strobed on tracking-mode
    strobe patterns: alternation with occasional single-sample slips
    (3-gaps / double strobes), across carry levels."""
    rng = np.random.RandomState(3)
    B, N = 4, 4096
    for trial, (n_out, cap) in enumerate(
            [(1900, 512), (1900, 512), (2048, 4096), (2000, 2048)]):
        # build per-stream alternating strobes with injected slips whose
        # NET drift stays within the documented EXTRACT_MAX_DRIFT bound
        # (the fast path's contract; denser random slips walk past it
        # and are flagged, which test_extract_fast_flags_excess_drift
        # covers separately)
        R = sync.EXTRACT_MAX_DRIFT
        s = np.zeros((B, N), np.int8)
        for b in range(B):
            pos = b % 2
            j = pos
            drift = 0
            while j < N:
                s[b, j] = 1
                step = 2
                r = rng.rand()
                if r < 0.01 and drift > -(R - 1):
                    step = 3        # missed strobe (3-gap)
                    drift -= 1
                elif r < 0.02 and drift < R - 1:
                    step = 1        # double strobe
                    drift += 1
                j += step
        y = rng.randn(B, N, 2).astype(np.float32)
        count0 = np.array([0, 3, 57, cap - 2][:B], np.int32)
        buf0 = np.zeros((B, cap, 2), np.float32)
        for b in range(B):
            buf0[b, :count0[b]] = rng.randn(count0[b], 2)
        st0 = sync.ExtractState(buf=jnp.asarray(buf0),
                                count=jnp.asarray(count0))
        a_sym, a_st, a_uf = sync.extract_strobed(
            jnp.asarray(y), jnp.asarray(s), n_out, st0)
        b_sym, b_st, b_uf, b_ovf = sync.extract_strobed_fast(
            jnp.asarray(y), jnp.asarray(s), n_out, st0)
        assert not np.asarray(b_ovf).any(), trial
        assert np.array_equal(np.asarray(a_uf), np.asarray(b_uf)), trial
        np.testing.assert_array_equal(np.asarray(a_sym),
                                      np.asarray(b_sym), err_msg=str(trial))
        assert np.array_equal(np.asarray(a_st.count),
                              np.asarray(b_st.count)), trial
        np.testing.assert_array_equal(np.asarray(a_st.buf),
                                      np.asarray(b_st.buf),
                                      err_msg=str(trial))


def test_extract_fast_flags_excess_drift():
    """Patterns beyond EXTRACT_MAX_DRIFT of alternation must be flagged
    (underflow/slip path), not silently corrupted."""
    B, N, n_out, cap = 1, 2048, 900, 256
    s = np.zeros((B, N), np.int8)
    s[0, : N // 2] = 1           # strobe density 1 for half the block
    y = np.random.RandomState(0).randn(B, N, 2).astype(np.float32)
    st0 = sync.extract_init(B, cap)
    _sym, _st, _uf, ovf = sync.extract_strobed_fast(
        jnp.asarray(y), jnp.asarray(s), n_out, st0)
    assert bool(ovf[0])


def test_frame_sync_realign_matches_gather():
    """The two-level realign (coarse block take_along + fine masked
    rolls) must equal the direct per-stream gather exactly for every
    start offset class."""
    from dvbs2_tpu.config import Config
    cfg = Config(modcod="QPSK-S_8/9")
    L = cfg.pl_frame_size
    B = 6
    rng = np.random.RandomState(11)
    frame = jnp.asarray(rng.randn(B, L, 2).astype(np.float32))
    st = sync.frame_sync_init(B, L)
    st = st._replace(delay_buf=jnp.asarray(
        rng.randn(B, L, 2).astype(np.float32)))
    # force specific delays via a crafted corr row (spike at max_idx)
    for delays in ([0, 1, 511, 512, 8281, L - 1],
                   [44, 513, 1023, 1024, 4185, L - 89]):
        corr = np.zeros((B, L), np.float32)
        for b, d in enumerate(delays):
            corr[b, (d + 89) % L] = 1e6
        aligned, dly, _f, _m, _st = sync.frame_sync_update(
            frame, jnp.asarray(corr), cfg, st)
        assert np.array_equal(np.asarray(dly), np.array(delays) % L)
        ext = np.concatenate([np.asarray(st.delay_buf),
                              np.asarray(frame)], axis=1)
        for b, d in enumerate(delays):
            startb = L - ((L - d) % L)
            ref = ext[b, startb:startb + L]
            np.testing.assert_array_equal(np.asarray(aligned)[b], ref,
                                          err_msg=f"delay {d}")


def test_var_shift_two_level_exact():
    """_var_shift_right/_left (coarse block gather + fine rolls) must
    equal numpy shifts for shifts spanning the coarse/fine boundary."""
    rng = np.random.RandomState(2)
    B, M = 5, 3000
    x = rng.randn(B, M, 2).astype(np.float32)
    shifts = np.array([0, 1, 511, 512, 2049], np.int32)[:B]
    xr = np.asarray(sync._var_shift_right(jnp.asarray(x),
                                          jnp.asarray(shifts), 2600))
    xl = np.asarray(sync._var_shift_left(jnp.asarray(x),
                                         jnp.asarray(shifts), 2600))
    for b, s in enumerate(shifts):
        r = np.zeros_like(x[b]); r[s:] = x[b, :M - s] if s else x[b]
        l = np.zeros_like(x[b]); l[:M - s] = x[b, s:] if s else x[b]
        np.testing.assert_array_equal(xr[b], r, err_msg=f"right {s}")
        np.testing.assert_array_equal(xl[b], l, err_msg=f"left {s}")
