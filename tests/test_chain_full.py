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
