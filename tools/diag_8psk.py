#!/usr/bin/env python
"""Diagnose the 8PSK-3/5 FER gap: estimator bias, LLR-scale sensitivity,
and Pallas-bf16 vs XLA-f32 SPA decoding."""
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import txrx_bb
from dvbs2_tpu.ops import bch, channel, estimator, framer, interleaver, ldpc
from dvbs2_tpu.ops import modem, scrambler

BATCH = 256
INNER = 8
EBN0 = 2.9
FER_REF, FE_REF = 2.30e-2, 103

cfg0 = Config(modcod="8PSK-S_3/5", ldpc_implem="SPA", ldpc_nite=50)
sigma_true = cfg0.ebn0_to_sigma(EBN0)

# ---- D4: estimator bias at this operating point ----
key = jax.random.key(1)
bits = jax.random.bernoulli(key, 0.5, (64, cfg0.K_bch)).astype(jnp.int8)
x = txrx_bb.tx_bb(bits, cfg0)
y = channel.awgn(jax.random.key(2), x, jnp.float32(sigma_true))
pl = scrambler.pl_scramble(y, descramble=True)
sym = framer.deframe(pl, cfg0.modcod)
sg = estimator.estimate_sigma(sym)
esn0_est = 10 * np.log10(1.0 / (2.0 * np.asarray(sg[:, 0]) ** 2))
esn0_true = cfg0.ebn0_to_esn0(EBN0)
print(f"D4 estimator: true Es/N0 {esn0_true:.3f} dB, est mean "
      f"{esn0_est.mean():.3f} dB (bias {esn0_est.mean()-esn0_true:+.3f}), "
      f"std {esn0_est.std():.3f}", flush=True)


def fer_with(tag, sigma_mult=1.0, use_pallas="auto", est="DVBS2",
             implem="SPA", target_fe=120, modcod="8PSK-S_3/5", ebn0=EBN0,
             fer_ref=FER_REF, fe_ref=FE_REF):
    cfg = Config(modcod=modcod, ldpc_implem=implem, ldpc_nite=50,
                 est_type=est)
    st = jnp.float32(cfg.ebn0_to_sigma(ebn0))

    def one(key):
        kb, kn = jax.random.split(key)
        b = jax.random.bernoulli(kb, 0.5, (BATCH, cfg.K_bch)).astype(jnp.int8)
        xx = txrx_bb.tx_bb(b, cfg)
        yy = channel.awgn(kn, xx, st)
        plh = scrambler.pl_scramble(yy, descramble=True)
        ss = framer.deframe(plh, cfg.modcod)
        if est == "PERFECT":
            sgm = jnp.broadcast_to(st, (ss.shape[0], 1))
        else:
            sgm = estimator.estimate_sigma(ss)
        sgm = sgm * sigma_mult
        llr = modem.demodulate(ss, sgm, cfg.mod)
        llr = interleaver.deinterleave(llr, cfg.itl_n_cols, cfg.read_order)
        post = ldpc.decode(llr, cfg.ldpc_code, n_ite=50, implem=implem,
                           use_pallas=use_pallas)
        hard = ldpc.hard_decision(post)[:, :cfg.N_bch]
        info, _ok = bch.decode(hard, cfg.K_bch)
        dec = scrambler.bb_scramble(info)
        errs = jnp.sum(b != dec, axis=-1)
        return jnp.sum(errs > 0), jnp.int32(BATCH)

    @jax.jit
    def scan_step(key):
        def body(c, i):
            fe, fr = one(jax.random.fold_in(key, i))
            return (c[0] + fe, c[1] + fr), None
        c, _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(0)),
                            jnp.arange(INNER))
        return c

    fe = fr = 0
    i = 0
    sb = zlib.crc32(tag.encode()) % 10000
    t0 = time.perf_counter()
    while fe < target_fe and fr < 600_000:
        o = scan_step(jax.random.key(sb * 100003 + i))
        fe += int(o[0]); fr += int(o[1])
        i += 1
    fer = fe / max(fr, 1)
    import math
    z = math.log(max(fer, 1e-12) / fer_ref) / math.sqrt(
        1 / max(fe, 1) + 1 / fe_ref)
    print(f"{tag}: FER={fer:.4e} ratio={fer/fer_ref:.3f} z={z:+.2f} "
          f"(fe={fe}, fra={fr}, {time.perf_counter()-t0:.0f}s)", flush=True)
    return fer


fer_with("D0 baseline pallas-SPA estDVBS2")
fer_with("D6 XLA-f32-SPA estDVBS2", use_pallas="never")
fer_with("D1 pallas-SPA estPERFECT", est="PERFECT")
fer_with("D3a pallas-SPA estPERFECT sigma*1.05", est="PERFECT",
         sigma_mult=1.05)
fer_with("D3b pallas-SPA estPERFECT sigma*0.95", est="PERFECT",
         sigma_mult=0.95)
