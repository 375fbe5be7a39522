import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx_bb
from dvbs2_tpu.ops import channel


@pytest.mark.parametrize("modcod", ["QPSK-S_8/9", "QPSK-S_3/5", "8PSK-S_8/9",
                                    "8PSK-S_3/5", "16APSK-S_8/9"])
def test_noiseless_roundtrip(modcod):
    """TX -> (no noise) -> RX recovers the info bits exactly."""
    cfg = Config(modcod=modcod, ldpc_nite=5, ldpc_implem="MS")
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.randint(0, 2, (2, cfg.K_bch)), dtype=jnp.int8)
    x = txrx_bb.tx_bb(bits, cfg)
    assert x.shape == (2, cfg.pl_frame_size, 2)
    # tiny noise so the estimator doesn't blow up
    y = channel.awgn(jax.random.key(0), x, jnp.float32(1e-3))
    dec = txrx_bb.rx_bb(y, jnp.float32(1e-3), cfg)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))


def test_tx_unit_energy():
    cfg = Config()
    rng = np.random.RandomState(1)
    bits = jnp.asarray(rng.randint(0, 2, (2, cfg.K_bch)), dtype=jnp.int8)
    x = np.asarray(txrx_bb.tx_bb(bits, cfg))
    es = np.mean(x[..., 0] ** 2 + x[..., 1] ** 2)
    assert abs(es - 1.0) < 0.02


def test_step_counts_errors_at_low_snr():
    """At very low SNR every frame should fail; monitor must say so."""
    cfg = Config(ldpc_nite=2, ldpc_implem="MS")
    sigma = jnp.float32(cfg.ebn0_to_sigma(-5.0))
    r = txrx_bb.txrx_bb_step(jax.random.key(1), sigma, cfg, batch=2)
    assert int(r.fe) == 2 and int(r.n_frames) == 2
    assert int(r.be) > 0


def test_step_no_errors_at_high_snr():
    cfg = Config(ldpc_nite=10, ldpc_implem="SPA")
    sigma = jnp.float32(cfg.ebn0_to_sigma(7.0))
    r = txrx_bb.txrx_bb_step(jax.random.key(2), sigma, cfg, batch=2)
    assert int(r.fe) == 0 and int(r.be) == 0


def test_jit_step_compiles():
    cfg = Config(ldpc_nite=2, ldpc_implem="NMS")
    fn = txrx_bb.jit_step(cfg, batch=2)
    r = fn(jax.random.key(0), jnp.float32(0.3))
    assert int(r.n_frames) == 2
