"""Coarse-frequency PLL + step-MF acquisition (reference:
Synchronizer_freq_coarse_DVBS2_aib.cpp, Synchronizer_step_mf_cc.cpp,
waiting/learning phases TX_RX/main.cpp:445-613)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import acquisition, channel_chain, txrx
from dvbs2_tpu.chains.tx import tx_stream
from dvbs2_tpu.ops import sync


def test_coarse_gains_closed_form():
    kp, ki = sync.coarse_gains(np.sqrt(0.5), 1e-4)
    zeta, bn = np.sqrt(0.5), 1e-4
    theta = bn / (zeta + 0.25 / zeta)
    d = 1 + 2 * zeta * theta + theta * theta
    assert np.isclose(kp, (4 * zeta * theta / d) / 2.0)
    assert np.isclose(ki, (4 * theta * theta / d) / 2.0)


def test_scrambled_pilot_table():
    tab = sync.scrambled_pilot_table("QPSK-S_8/9")
    cfg = Config()
    assert tab.shape == (cfg.pl_frame_size, 2)
    mag = tab[..., 0] ** 2 + tab[..., 1] ** 2
    assert np.allclose(mag[:90], 0.0)
    assert np.allclose(mag[90:], 1.0, atol=1e-6)
    # first payload symbol: exp(j*pi/2*(R(0)+0.5)); R(0)=0 -> (1+j)/sqrt2
    assert np.allclose(tab[90], [np.sqrt(0.5), np.sqrt(0.5)], atol=1e-6)


def test_step_mf_pll_pulls_toward_cfo():
    """With a known CFO and genie DEL feedback, the PLL integrator must move
    toward the true frequency within a few frames (widened Bn for speed)."""
    cfg = Config(modcod="QPSK-S_8/9", chn_max_delay=4.0,
                 chn_max_freq_shift=0.02)
    B, L = 1, cfg.pl_frame_size
    key = jax.random.key(3)
    bits = jax.random.bernoulli(key, 0.5, (B, 8, cfg.K_bch)).astype(jnp.int8)
    x, _ = tx_stream(bits, cfg)
    y, _ = channel_chain.apply(jax.random.key(4), x, 1e-3, cfg)

    st = acquisition.acq_init(cfg, B)
    step = jax.jit(lambda blk, st: acquisition.acq_frame(
        blk, cfg, st, norm_bandwidth=2e-3))
    for f in range(8):
        blk = y[:, f * L * cfg.shp_osf:(f + 1) * L * cfg.shp_osf]
        st, flag, uf, metric = step(blk, st)
    est = float(st.smf.coarse.est_freq[0])
    assert est > 0.01, f"PLL did not pull in (est={est})"
    assert bool(flag[0]), "frame sync should lock on a clean signal"


@pytest.mark.slow
def test_full_acquisition_then_decode_cfo():
    """WAITING + LEARNING 1-3 at CFO=0.05 (the refs/TX_RX freq_005 config),
    then clean decode in the transmission phase."""
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="MS", ldpc_nite=5,
                 chn_max_delay=4.0, chn_max_freq_shift=0.05)
    B, F = 1, 2
    state = txrx.txrx_init(cfg, B)
    key = jax.random.key(7)
    sigma = jnp.float32(1e-2)
    trace = []
    state = txrx.acquire(jax.random.fold_in(key, 99), sigma, cfg, state, B,
                         learn12=60, learn3=40, trace=trace)
    nu = float(state.rx.coarse.nu[0])
    assert abs(nu + cfg.chn_max_freq_shift) < 0.01, nu
    # probe trace (the --stats-path dump rows) covers every phase and shows
    # the PLL converging toward the true CFO
    phases = {row[0] for row in trace}
    assert {"WAITING", "LEARNING_1", "LEARNING_2", "LEARNING_3"} <= phases
    nus = [row[3] for row in trace if row[0] == "LEARNING_2"]
    # probe nu is the mixer frequency (= -CFO when locked)
    assert abs(nus[-1] + cfg.chn_max_freq_shift) < 0.01
    step = txrx.jit_step(cfg, B, F)
    be = fe = n = 0
    for i in range(5):
        r = step(jax.random.fold_in(key, i), sigma, state)
        state = r.state
        be += int(r.be); fe += int(r.fe); n += int(r.n_frames)
    assert n >= 8
    assert fe == 0 and be == 0
