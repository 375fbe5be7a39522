"""Genie (PERFECT) sync variants as test oracles — the reference's
--perfect-sync mode isolating FEC from synchronization (reference:
src/common/Factory/DVBS2/DVBS2.cpp:97 and the *_perfect module variants,
SURVEY.md §4.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import filters, sync
from dvbs2_tpu.chains import txrx


def test_coarse_perfect_inverts_cfo():
    """coarse_perfect derotation exactly undoes the channel CFO mixer."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 512, 2), jnp.float32)
    cfo = 0.05
    shifted, _ = filters.cfo_mix(x, cfo)
    back, _ = sync.coarse_perfect(shifted, cfo, filters.NcoState(
        n=jnp.float32(0.0)))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("cfo,delay", [(0.0, 4.0), (0.05, 4.5)])
def test_full_chain_perfect_sync_decodes_clean(cfo, delay):
    """Full chain with every synchronizer replaced by its genie: at a
    comfortable SNR all frames must decode error-free — any failure is a
    FEC/framing bug, not a sync bug (the whole point of PERFECT modes)."""
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
                 perfect_sync=True, est_type="PERFECT",
                 chn_max_freq_shift=cfo, chn_max_delay=delay)
    B, F = 2, 2
    sigma = jnp.float32(cfg.ebn0_to_sigma(6.0))
    state = txrx.txrx_init(cfg, B)
    step = txrx.jit_step(cfg, B, F)
    key = jax.random.key(17)
    fe = n = 0
    for i in range(10):
        r = step(jax.random.fold_in(key, i), sigma, state)
        state = r.state
        fe += int(r.fe)
        n += int(r.n_frames)
    assert n > 0, "no frames counted past warmup"
    assert fe == 0, f"perfect-sync chain had {fe}/{n} frame errors"
