#!/usr/bin/env python
"""Decode-path and tx+channel sub-stage decomposition at bench geometry.

probe_parts4 puts decode(garbage) at ~73 ms while the LDPC NMS-10 kernel
bound is ~26 ms for 4096 frames (ROOFLINE.md §2) — this probe splits the
glue (deframe, estimator, demod, deinterleave, BCH, monitor) and the
tx+channel stage (encode, shaping, AWGN RNG, CFO mix, delays) to name
where the remainder lives.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains import tx as txc
from dvbs2_tpu.chains import channel_chain, txrx
from dvbs2_tpu.ops import bch, estimator, framer, interleaver, ldpc, modem
from dvbs2_tpu.ops import filters

B = int(os.environ.get("PROBE_B", "128"))
F = int(os.environ.get("PROBE_F", "32"))
cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10,
             chn_max_freq_shift=0.05, chn_max_delay=4.5, stm_hold_size=404)
L = cfg.pl_frame_size
N = F * L * cfg.shp_osf
NF = B * F
state0 = txrx.txrx_init(cfg, B)
base_key = jax.random.key(time.time_ns() % (2 ** 31))
sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))


def diff_time(make_body, n_long=4, wins=3):
    @functools.partial(jax.jit, static_argnums=0)
    def run(n, key):
        def body(acc, i):
            return acc + make_body(jax.random.fold_in(key, i)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc
    float(run(1, base_key))
    float(run(n_long, base_key))
    best = float("inf")
    for w in range(wins):
        kw = jax.random.fold_in(base_key, 7000 + w)
        t0 = time.perf_counter(); float(run(1, kw)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(n_long, kw)); tl = time.perf_counter() - t0
        best = min(best, (tl - t1) / (n_long - 1))
    return best


def t(name, body, **kw):
    dt = diff_time(body, **kw)
    print(f"  {name:24s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main():
    print("decode path:")
    t("deframe", lambda k: framer.deframe(
        jax.random.normal(k, (NF, L, 2), jnp.float32), cfg.modcod)
        .ravel()[0])
    xfec0 = jax.random.normal(jax.random.fold_in(base_key, 2),
                              (NF, cfg.N_xfec_frame, 2), jnp.float32)

    def demod_body(k):
        xfec = xfec0 * jax.random.normal(k, (1, 1, 1))
        sg_ = estimator.estimate_sigma(xfec)
        return modem.demodulate(xfec, sg_, cfg.mod).ravel()[0]
    t("estimate+demod", demod_body)
    llr0 = jax.random.normal(jax.random.fold_in(base_key, 3),
                             (NF, cfg.N_ldpc), jnp.float32)
    t("deinterleave", lambda k: interleaver.deinterleave(
        llr0 * jax.random.normal(k, (1, 1)), cfg.itl_n_cols,
        cfg.read_order).ravel()[0])
    t("ldpc(nms10)", lambda k: ldpc.decode(
        llr0 * jax.random.normal(k, (1, 1)), cfg.ldpc_code,
        n_ite=cfg.ldpc_nite, implem=cfg.ldpc_implem,
        norm_factor=cfg.ldpc_norm_factor,
        syndrome_exit=cfg.ldpc_syndrome_exit).ravel()[0])
    hard0 = (llr0[:, :cfg.N_bch] > 0).astype(jnp.int8)

    def bch_body(k):
        h = hard0 ^ (jax.random.uniform(k, (1, 1)) > 2).astype(jnp.int8)
        info, ok = bch.decode(h, cfg.K_bch)
        return info.ravel()[0].astype(jnp.float32)
    t("bch", bch_body)

    return
    print("tx+channel:")
    t("bits rng", lambda k: jax.random.bernoulli(
        k, 0.5, (B, F, cfg.K_bch)).astype(jnp.int8).ravel()[0]
        .astype(jnp.float32))
    bits0 = jax.random.bernoulli(jax.random.fold_in(base_key, 4), 0.5,
                                 (B, F, cfg.K_bch)).astype(jnp.int8)

    def txs(k):
        b = bits0 ^ (jax.random.uniform(k, (1, 1, 1)) > 2).astype(jnp.int8)
        x, _st = txc.tx_stream(b, cfg, state0.tx)
        return x.ravel()[0]
    t("tx_stream(all)", txs)

    x0 = jax.random.normal(jax.random.fold_in(base_key, 5), (B, N, 2),
                           jnp.float32)

    def chan(k):
        y, _st = channel_chain.apply(k, x0, sigma, cfg, state0.ch)
        return y.ravel()[0]
    t("channel(all)", chan)
    t("awgn rng only", lambda k: (jax.random.normal(k, (B, N, 2))
                                  .ravel()[0]))


if __name__ == "__main__":
    main()
