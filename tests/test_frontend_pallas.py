"""Fused front-end Pallas kernel (interpret mode) vs the XLA stage
composition coarse_mix -> AGC -> matched FIR -> blocked Gardner."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains.tx import tx_stream, TxState
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.ops import cplx, filters, frontend_pallas, sync


def _stream(cfg, B, n_frames, ebn0, seed):
    """Noisy channel stream + exact-scan-locked front-end state."""
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    n_hist = (len(taps) + cfg.shp_osf - 1) // cfg.shp_osf
    tx_st = TxState(shp=jnp.zeros((B, n_hist, 2), jnp.float32))
    ch_st = channel_chain.init_state(cfg, B)
    sigma = jnp.float32(cfg.ebn0_to_sigma(ebn0))
    key = jax.random.key(seed)

    import functools

    @functools.partial(jax.jit, static_argnums=3)
    def produce(k, tx_st, ch_st, F):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(kb, 0.5,
                                    (B, F, cfg.K_bch)).astype(jnp.int8)
        x, tx_st = tx_stream(bits, cfg, tx_st)
        y, ch_st = channel_chain.apply(kn, x, sigma, cfg, ch_st)
        return y, tx_st, ch_st

    # warm the Gardner with the exact scan on a matched-filtered block
    warm, tx_st, ch_st = produce(key, tx_st, ch_st, 2)
    wm, _ = sync.coarse_mix(warm, sync.coarse_init(B, cfg.pl_frame_size))
    wm = filters.agc(wm, output_energy=1.0 / cfg.shp_osf)
    wf, mf_st = filters.fir(wm, taps, filters.fir_init(len(taps), B))
    _, _, gst = jax.jit(lambda v: sync.gardner_scan(v, cfg))(wf)
    x, _, _ = produce(jax.random.fold_in(key, 1), tx_st, ch_st, n_frames)
    return x, mf_st, gst


def _xla_reference(x, cfg, coarse, mf_st, gst):
    """The exact composition the kernel implements: AGC scale from the
    raw block, mix, scale, FIR, blocked Gardner."""
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(cplx.abs2(x - mean), axis=1)
    scale = np.sqrt(1.0 / cfg.shp_osf) / jnp.sqrt(var)
    y, _ = sync.coarse_mix(x, coarse)
    y = y * scale[:, None, None]
    y, mf2 = filters.fir(y, taps, mf_st)
    y, strobe, g2 = sync.gardner_scan_blocked(y, cfg, gst)
    return y, strobe, mf2, g2


@pytest.mark.parametrize("delay", [4.5, 4.0])
def test_frontend_kernel_matches_xla(delay):
    B, F = 8, 2
    cfg0 = Config(modcod="QPSK-S_8/9", chn_max_delay=delay)
    N = F * cfg0.pl_frame_size * cfg0.shp_osf
    H = frontend_pallas.pick_hold(N, 101)
    cfg = Config(modcod="QPSK-S_8/9", chn_max_delay=delay, stm_hold_size=H)
    assert sync._pick_hold(N, H) == H, "XLA and kernel must share H"

    x, mf_st, gst = _stream(cfg, B, F, ebn0=6.0, seed=int(delay * 10))
    coarse = sync.coarse_init(B, cfg.pl_frame_size)
    # non-trivial frozen mixer + phase index
    coarse = coarse._replace(
        nu=jnp.full((B,), -0.002, jnp.float32),
        n=jnp.arange(B, dtype=jnp.float32) * 37.0)

    y_ref, s_ref, mf_ref, g_ref = jax.jit(
        lambda x_, c_, m_, g_: _xla_reference(x_, cfg, c_, m_, g_))(
            x, coarse, mf_st, gst)
    y_k, s_k, coarse_k, mf_k, g_k = frontend_pallas.frontend(
        x, cfg, coarse, mf_st, gst, interpret=True, lane=8)

    assert np.array_equal(np.asarray(s_k), np.asarray(s_ref).astype(np.int8))
    scale = float(jnp.max(jnp.abs(y_ref)))
    err = float(jnp.max(jnp.abs(y_k - y_ref)))
    assert err < 2e-4 * scale, (err, scale)
    # carried state agreement
    assert float(jnp.max(jnp.abs(mf_k - mf_ref))) < 1e-5
    for name in ("nco", "lf_prev", "lf_out", "mu"):
        a = getattr(g_k, name)
        b = getattr(g_ref, name)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4, name
    for name in ("head", "mid", "history"):
        assert np.array_equal(np.asarray(getattr(g_k, name)),
                              np.asarray(getattr(g_ref, name))), name
    assert float(jnp.max(jnp.abs(g_k.farrow - g_ref.farrow))) < 1e-4
    assert float(jnp.max(jnp.abs(g_k.ted_buf - g_ref.ted_buf))) < 1e-4
