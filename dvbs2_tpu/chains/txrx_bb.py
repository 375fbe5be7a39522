"""Baseband TX->channel->RX Monte-Carlo step — the ``dvbs2_tx_rx_bb``
equivalent (reference: src/mains/TX_RX_BB/main.cpp socket graph at :75-94).

Where the reference builds a StreamPU task graph and clones it per thread,
here the whole chain is ONE pure jitted function over an (F, ...) frame batch;
parallelism comes from the batch axis (vectorized on device, sharded across a
mesh by harness/parallel) rather than from module cloning.

Chain: source -> BB scramble -> BCH enc -> LDPC enc -> interleave -> map ->
frame -> PL scramble -> AWGN -> PL descramble -> deframe -> estimate ->
demap -> deinterleave -> LDPC decode -> BCH decode -> BB descramble ->
monitor (BE/FE).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import bch, channel, estimator, framer, interleaver, ldpc
from dvbs2_tpu.ops import modem, scrambler


class StepResult(NamedTuple):
    be: jnp.ndarray        # () total bit errors in the batch
    fe: jnp.ndarray        # () total frame errors in the batch
    n_frames: jnp.ndarray  # () frames processed
    # sum over frames of the blind estimator's Es/N0 (dB) — feeds the
    # Reporter_noise_DVBS2 est-vs-true columns (reference:
    # Tools/Reporter/Reporter_noise_DVBS2.cpp:15-80); zeros when est PERFECT
    esn0_est_sum: jnp.ndarray = jnp.float32(0.0)


def tx_bb(bits: jnp.ndarray, cfg: Config,
          group_perm: jnp.ndarray = None) -> jnp.ndarray:
    """(F, K_bch) info bits -> (F, pl_frame_size) unit-energy symbols.

    ``group_perm``: optional traced UEP row-placement permutation of the
    LDPC table (ops/ldpc.py) — lets the placement scans reuse one compiled
    step across hundreds of placements."""
    scr = scrambler.bb_scramble(bits)
    bch_cw = bch.encode(scr, cfg.K_bch)
    ldpc_cw = ldpc.encode(bch_cw, cfg.ldpc_code, group_perm=group_perm)
    itl = interleaver.interleave(ldpc_cw, cfg.itl_n_cols, cfg.read_order)
    sym = modem.modulate(itl, cfg.mod)
    pl = framer.frame(sym, cfg.modcod)
    return scrambler.pl_scramble(pl)


def rx_bb(pl_noisy: jnp.ndarray, sigma_true: jnp.ndarray, cfg: Config,
          with_est: bool = False, group_perm: jnp.ndarray = None):
    """(F, pl_frame_size) noisy symbols -> (F, K_bch) decoded info bits
    (optionally also the estimator's per-frame sigma for the noise
    reporter)."""
    pl = scrambler.pl_scramble(pl_noisy, descramble=True)
    sym = framer.deframe(pl, cfg.modcod)
    if cfg.est_type == "PERFECT":
        sigma = jnp.broadcast_to(sigma_true, (sym.shape[0], 1))
    else:
        sigma = estimator.estimate_sigma(sym)
    llr = modem.demodulate(sym, sigma, cfg.mod)
    llr = interleaver.deinterleave(llr, cfg.itl_n_cols, cfg.read_order)
    post = ldpc.decode(llr, cfg.ldpc_code, n_ite=cfg.ldpc_nite, implem=cfg.ldpc_implem,
                       norm_factor=cfg.ldpc_norm_factor,
                       syndrome_exit=cfg.ldpc_syndrome_exit,
                       group_perm=group_perm)
    hard = ldpc.hard_decision(post)[:, :cfg.N_bch]
    info, _ok = bch.decode(hard, cfg.K_bch)
    dec = scrambler.bb_scramble(info)       # BB descramble == scramble
    return (dec, sigma) if with_est else dec


def txrx_bb_step_bits(bits: jnp.ndarray, key: jax.Array, sigma: jnp.ndarray,
                      cfg: Config, group_perm: jnp.ndarray = None) -> StepResult:
    """Monte-Carlo step over CALLER-PROVIDED info bits (host sources:
    --src-type USER/USER_BIN/AZCW; reference DVBS2.cpp:359-389)."""
    x = tx_bb(bits, cfg, group_perm=group_perm)
    y = channel.awgn(key, x, sigma)
    dec, sig_est = rx_bb(y, sigma, cfg, with_est=True, group_perm=group_perm)
    errs = jnp.sum(bits != dec, axis=-1)
    esn0_est = 10.0 * jnp.log10(1.0 / (2.0 * sig_est[:, 0] ** 2))
    return StepResult(be=jnp.sum(errs), fe=jnp.sum(errs > 0),
                      n_frames=jnp.int32(bits.shape[0]),
                      esn0_est_sum=jnp.sum(esn0_est))


def txrx_bb_step(key: jax.Array, sigma: jnp.ndarray, cfg: Config,
                 batch: int, group_perm: jnp.ndarray = None) -> StepResult:
    """One Monte-Carlo batch: generate, transmit, corrupt, receive, count."""
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (batch, cfg.K_bch)).astype(jnp.int8)
    return txrx_bb_step_bits(bits, kn, sigma, cfg, group_perm=group_perm)


@functools.lru_cache(maxsize=None)
def jit_step(cfg: Config, batch: int):
    """Compiled Monte-Carlo step for a given config/batch (cfg is static)."""
    def step(key, sigma):
        return txrx_bb_step(key, sigma, cfg, batch)
    return jax.jit(step)
