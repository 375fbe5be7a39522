"""Per-stage observability — the counterparts of StreamPU's task statistics
(``--sim-stats`` -> spu::tools::Stats::show, reference: src/mains/TX_RX/
main.cpp:704-719) and per-socket debug dumps (``--sim-dbg`` ->
Task::set_debug, reference: DVBS2.cpp:81-82).

Under XLA the whole chain compiles into one fused program, so per-stage
numbers can't be sampled from inside the production step; instead each
stage is jitted and timed SEPARATELY on representative data.  The split
matches the reference's task list, so the tables read the same way.  On the
remote-TPU transport a result fetch costs a full round trip, so each stage
is timed over ``reps`` back-to-back dispatches closed by one scalar fetch.
"""
from __future__ import annotations

import time
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import bch, channel, estimator, framer, interleaver, ldpc
from dvbs2_tpu.ops import modem, scrambler


def bb_stages(cfg: Config, sigma) -> List[Tuple[str, str, Callable]]:
    """Ordered (module, task, fn) list decomposing the BB chain, mirroring
    the reference's socket graph (TX_RX_BB/main.cpp:75-94)."""
    sig = jnp.float32(sigma)

    def est_or_perfect(sym):
        if cfg.est_type == "PERFECT":
            return jnp.broadcast_to(sig, (sym.shape[0], 1))
        return estimator.estimate_sigma(sym)

    return [
        ("source", "generate", None),        # needs (key, batch) — special
        ("bb_scrambler", "scramble", lambda b: scrambler.bb_scramble(b)),
        ("BCH_encoder", "encode", lambda b: bch.encode(b, cfg.K_bch)),
        ("LDPC_encoder", "encode", lambda b: ldpc.encode(b, cfg.ldpc_code)),
        ("interleaver", "interleave",
         lambda b: interleaver.interleave(b, cfg.itl_n_cols, cfg.read_order)),
        ("modem", "modulate", lambda b: modem.modulate(b, cfg.mod)),
        ("framer", "generate", lambda s: framer.frame(s, cfg.modcod)),
        ("pl_scrambler", "scramble", lambda s: scrambler.pl_scramble(s)),
        ("channel", "add_noise",
         lambda s: channel.awgn(jax.random.key(7), s, sig)),
        ("pl_scrambler", "descramble",
         lambda s: scrambler.pl_scramble(s, descramble=True)),
        ("framer", "remove_plh", lambda s: framer.deframe(s, cfg.modcod)),
        ("estimator", "estimate", est_or_perfect),
        ("modem", "demodulate", None),       # needs (sym, sigma) — special
        ("interleaver", "deinterleave",
         lambda l: interleaver.deinterleave(l, cfg.itl_n_cols,
                                            cfg.read_order)),
        ("LDPC_decoder", "decode_siho",
         lambda l: ldpc.decode(l, cfg.ldpc_code, n_ite=cfg.ldpc_nite,
                               implem=cfg.ldpc_implem,
                               norm_factor=cfg.ldpc_norm_factor,
                               syndrome_exit=cfg.ldpc_syndrome_exit)),
        ("BCH_decoder", "decode_hiho",
         lambda p: bch.decode(ldpc.hard_decision(p)[:, :cfg.N_bch],
                              cfg.K_bch)[0]),
        ("bb_scrambler", "descramble", lambda b: scrambler.bb_scramble(b)),
    ]


def rx_stages(cfg: Config, batch: int, ebn0: float = 4.0):
    """(module, task, fn, input) list decomposing the FULL RX chain on
    representative data — the task list the scheduler profiles (reference
    RX binding: src/mains/RX/main_sched.cpp:197-223).  Stage inputs are
    synthetic (correct shapes/states); timings are what matters here."""
    from dvbs2_tpu.ops import filters as _f, sync as _s
    B, L, osf = batch, cfg.pl_frame_size, cfg.shp_osf
    sigma = jnp.float32(cfg.ebn0_to_sigma(ebn0))
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, L * osf, 2), jnp.float32)
    frame = jax.random.normal(key, (B, L, 2), jnp.float32)
    xfec = jax.random.normal(key, (B, cfg.N_xfec_frame, 2), jnp.float32)
    llr = jax.random.normal(key, (B, 16200), jnp.float32) * 4.0
    hard = jax.random.bernoulli(key, 0.5, (B, cfg.N_bch)).astype(jnp.int8)
    bits = jax.random.bernoulli(key, 0.5, (B, cfg.K_bch)).astype(jnp.int8)
    taps = _f.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    coarse0 = _s.coarse_init(B, L)
    g0 = _s.gardner_init(B, osf)
    ex0 = _s.extract_init(B, cap=4 * osf * L)
    fs0 = _s.frame_sync_init(B, L)
    lr0 = _s.lr_init(B)
    strobe = jnp.asarray(
        (np.arange(L * osf) % osf == 0).astype(np.int8))[None].repeat(B, 0)
    sg = jnp.full((B, 1), sigma)
    return [
        ("sync_coarse_f", "synchronize", lambda v: _s.coarse_mix(v, coarse0), x),
        ("mult_agc", "imultiply",
         lambda v: _f.agc(v, output_energy=1.0 / osf), x),
        ("matched_flt", "filter", lambda v: _f.fir(v, taps), x),
        ("sync_timing", "synchronize",
         lambda v: _s.gardner_scan(v, cfg, g0), x),
        ("sync_timing", "extract",
         lambda v: _s.extract_strobed(v, strobe, L, ex0), x),
        ("sync_frame", "synchronize",
         lambda v: _s.frame_sync(v, cfg, fs0), frame),
        ("pl_scrambler", "descramble",
         lambda v: scrambler.pl_scramble(v, descramble=True), frame),
        ("sync_fine_lr", "synchronize",
         lambda v: _s.lr_fine_freq(v, cfg, lr0), frame),
        ("sync_fine_pf", "synchronize",
         lambda v: _s.phase_freq_fine(v, cfg), frame),
        ("framer", "remove_plh",
         lambda v: framer.deframe(v, cfg.modcod), frame),
        ("estimator", "estimate", lambda v: estimator.estimate_sigma(v), xfec),
        ("modem", "demodulate",
         lambda v: modem.demodulate(v, sg, cfg.mod), xfec),
        ("itl_rx", "deinterleave",
         lambda v: interleaver.deinterleave(v, cfg.itl_n_cols,
                                            cfg.read_order), llr),
        ("LDPC_decoder", "decode_siho",
         lambda v: ldpc.decode(v, cfg.ldpc_code, n_ite=cfg.ldpc_nite,
                               implem=cfg.ldpc_implem,
                               norm_factor=cfg.ldpc_norm_factor,
                               syndrome_exit=cfg.ldpc_syndrome_exit), llr),
        ("BCH_decoder", "decode_hiho",
         lambda v: bch.decode(v, cfg.K_bch)[0], hard),
        ("bb_scrambler", "descramble",
         lambda v: scrambler.bb_scramble(v), bits),
    ]


def _chain_values(cfg: Config, batch: int, ebn0: float):
    """Run the chain stage by stage, returning each stage's (name, task,
    fn, input value)."""
    sigma = cfg.ebn0_to_sigma(ebn0)
    stages = bb_stages(cfg, sigma)
    key = jax.random.key(0)
    bits = jax.random.bernoulli(jax.random.key(1), 0.5,
                                (batch, cfg.K_bch)).astype(jnp.int8)
    rows = []
    x = bits
    sig_est = None
    for (mod, task, fn) in stages:
        if task == "generate" and mod == "source":
            rows.append((mod, task, lambda k: jax.random.bernoulli(
                k, 0.5, (batch, cfg.K_bch)).astype(jnp.int8), key))
            continue
        if mod == "modem" and task == "demodulate":
            sym = x
            fn = lambda s, sg=sig_est: modem.demodulate(s, sg, cfg.mod)
        rows.append((mod, task, fn, x))
        out = fn(x)
        if mod == "estimator":
            sig_est = out            # estimate feeds demodulate's CP socket
        else:
            x = out
    return rows


def run_stats(cfg: Config, batch: int = 128, ebn0: float = 4.0,
              reps: int = 8, out=print) -> list:
    """Time each stage separately; print a Stats::show-like table."""
    rows = _chain_values(cfg, batch, ebn0)
    results = []
    for (mod, task, fn, val) in rows:
        f = jax.jit(fn)
        jax.block_until_ready(f(val))
        # warm fetch to force compile + cache
        np.asarray(jax.tree_util.tree_leaves(f(val))[0]).ravel()[:1]
        t0 = time.perf_counter()
        outs = [f(val) for _ in range(reps)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / reps
        results.append((mod, task, dt))
    total = sum(r[2] for r in results)
    out("# -------------------------------------------||------------------------------")
    out("#        Statistics for the given task       ||       Basic statistics       ")
    out("#     ('*' = any, '-' = same as previous)    ||          on the task         ")
    out("# -------------------------------------------||------------------------------")
    out("#          MODULE |            TASK |  CALLS ||  TOT(ms) |  AVG(us) | PERC(%)")
    out("# ----------------|-----------------|--------||----------|----------|--------")
    for (mod, task, dt) in results:
        out(f"# {mod:>15s} | {task:>15s} | {reps:6d} || "
            f"{dt*reps*1e3:8.2f} | {dt*1e6:8.1f} | {100*dt/total:6.2f}")
    out(f"# {'TOTAL':>15s} | {'*':>15s} | {reps:6d} || "
        f"{total*reps*1e3:8.2f} | {total*1e6:8.1f} | 100.00")
    out(f"# (batch={batch} frames/call, Eb/N0={ebn0} dB, "
        f"info throughput at TOTAL = "
        f"{batch*cfg.K_bch/total/1e6:.1f} Mb/s)")
    return results


def run_debug(cfg: Config, batch: int = 2, ebn0: float = 4.0,
              limit: int = 16, out=print) -> None:
    """Print every stage's output values (Task::set_debug counterpart)."""
    rows = _chain_values(cfg, batch, ebn0)
    for (mod, task, fn, val) in rows:
        o = fn(val)
        arr = np.asarray(jax.tree_util.tree_leaves(o)[0])
        flat = arr.ravel()[:limit]
        body = ", ".join(f"{v:.4f}" if arr.dtype.kind == "f" else str(v)
                         for v in flat)
        out(f"# {mod}::{task} out{list(arr.shape)} = [{body}"
            f"{', ...' if arr.size > limit else ''}]")
