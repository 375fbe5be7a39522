"""Traced-vs-static channel-impairment equivalence (split from
test_chain_full.py so the compile-heavy dyn program parallelizes onto
its own xdist worker)."""
import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx


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
