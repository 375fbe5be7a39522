"""Full filtered chain integration: TX shaping -> channel (delay/CFO/AWGN)
-> RX (matched filter, Gardner, frame sync, L&R, fine phase, FEC)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx


def _run(cfg, B, F, n_steps, sigma, seed=0):
    state = txrx.txrx_init(cfg, B)
    step = txrx.jit_step(cfg, B, F)
    key = jax.random.key(seed)
    be = fe = n = 0
    for i in range(n_steps):
        r = step(jax.random.fold_in(key, i), jnp.float32(sigma), state)
        state = r.state
        be += int(r.be)
        fe += int(r.fe)
        n += int(r.n_frames)
    return be, fe, n


def test_full_chain_gardner_near_noiseless():
    """Real Gardner + real frame sync, delay 4.5: zero errors past warmup."""
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="MS", ldpc_nite=5,
                 chn_max_delay=4.5)
    be, fe, n = _run(cfg, B=2, F=4, n_steps=4, sigma=1e-3)
    assert n > 0
    assert fe == 0 and be == 0


@pytest.mark.slow
def test_full_chain_operating_snr():
    """At Eb/N0=4.2 dB (above waterfall) the full chain decodes cleanly."""
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="SPA", ldpc_nite=30,
                 chn_max_delay=4.5)
    sigma = cfg.ebn0_to_sigma(4.2)
    be, fe, n = _run(cfg, B=2, F=4, n_steps=6, sigma=sigma)
    assert n >= 20
    assert fe <= 1   # allow a rare residual during late convergence


def test_frame_lag_accounting():
    cfg = Config(chn_max_delay=4.5)
    assert txrx.total_sample_delay(cfg) == 80 + 4 + 3
    assert txrx.frame_lag(cfg) == 1


def test_dyn_impairments_match_static():
    """Traced (cfo, frac_mu) channel impairments must reproduce the
    statically-baked config bit-for-bit (modulo fp noise): one compiled
    program then serves every refs/TX_RX parity config sharing the integer
    delay part (tools/parity_full.py)."""
    cfg_s = Config(modcod="QPSK-S_8/9", ldpc_implem="MS", ldpc_nite=5,
                   chn_max_freq_shift=0.05, chn_max_delay=4.5)
    cfg_b = Config(modcod="QPSK-S_8/9", ldpc_implem="MS", ldpc_nite=5,
                   chn_max_freq_shift=0.0, chn_max_delay=4.0)
    B, F = 2, 4
    key = jax.random.key(0)
    st_s = txrx.txrx_init(cfg_s, B)
    st_b = txrx.txrx_init(cfg_b, B)
    sigma = jnp.float32(1e-3)
    dyn = (jnp.float32(0.05), jnp.float32(0.5))
    js = txrx.jit_step(cfg_s, B, F)
    jb = txrx.jit_step(cfg_b, B, F, with_dyn=True)
    for i in range(4):
        k = jax.random.fold_in(key, i)
        r_s = js(k, sigma, st_s)
        r_b = jb(k, sigma, st_b, dyn)
        st_s, st_b = r_s.state, r_b.state
        assert int(r_s.n_frames) == int(r_b.n_frames)
        assert int(r_s.fe) == int(r_b.fe), i
        # identical chains on identical noise: same error pattern up to
        # fp-rounding divergence (the static path bakes CFO/frac-delay as
        # constants, the traced path computes them — 1-ulp differences
        # compound chaotically through the timing loop during this cold
        # un-acquired pull-in, so garbage frames differ in a small
        # fraction of their bits; fe/n_frames equality plus <0.1% bit
        # agreement pins program equivalence)
        db = abs(int(r_s.be) - int(r_b.be))
        assert db <= max(16, 0.001 * int(r_s.be) * 2), i
    assert int(r_s.n_frames) > 0


def test_per_stream_sigma_and_counters():
    """Per-stream sigma: one batch sweeps several SNR points at once (the
    parity_full batching); per-stream counters must separate them."""
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="MS", ldpc_nite=5,
                 chn_max_delay=4.5)
    B, F = 2, 4
    sigma = jnp.asarray([1e-3, 10.0])   # stream 0 clean, stream 1 hopeless
    state = txrx.txrx_init(cfg, B)
    step = txrx.jit_step(cfg, B, F)
    key = jax.random.key(0)
    r = None
    for i in range(4):
        r = step(jax.random.fold_in(key, i), sigma, state)
        state = r.state
    assert r.be_s.shape == (B,) and r.fe_s.shape == (B,)
    assert int(r.fe_s[0]) == 0, "clean stream must decode"
    assert int(r.fe_s[1]) == int(r.n_s[1]) and int(r.n_s[1]) > 0, \
        "sigma=10 stream must fail every frame"
    assert int(r.fe) == int(r.fe_s.sum())
