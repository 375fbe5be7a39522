"""SNR estimation (equivalent of Estimator_DVBS2 / Estimator_perfect;
reference: src/common/Module/Estimator/Estimator_DVBS2.hxx:32-58).

Blind moment-2/moment-4 estimator on the XFEC symbols:
  Se = sqrt(|2 m2^2 - m4|),  Ne = |m2 - Se|,  EsN0_hat = 10 log10(Se/Ne)
saturated at 100 dB; sigma_hat = esn0_to_sigma(EsN0_hat).
The PERFECT variant (``--est-type PERFECT``) bypasses estimation with the true
sigma (reference: Estimator_perfect.hxx:49-60) — kept as the test oracle.
"""
from __future__ import annotations

import jax.numpy as jnp


def estimate_sigma(x: jnp.ndarray) -> jnp.ndarray:
    """(F, N_sym, 2) re/im symbols -> (F, 1) estimated per-real-dim noise std."""
    from dvbs2_tpu.ops import cplx
    p = cplx.abs2(x)
    m2 = jnp.mean(p, axis=-1, keepdims=True)
    m4 = jnp.mean(p * p, axis=-1, keepdims=True)
    se = jnp.sqrt(jnp.abs(2.0 * m2 * m2 - m4))
    ne = jnp.abs(m2 - se)
    esn0_db = 10.0 * jnp.log10(se / ne)
    esn0_db = jnp.where(jnp.isfinite(esn0_db), esn0_db, 100.0)
    esn0_db = jnp.minimum(esn0_db, 100.0)
    return jnp.sqrt(1.0 / (2.0 * 10.0 ** (esn0_db / 10.0)))
