"""Headline benchmark: decoded info throughput of the FULL dvbs2_tx_rx
chain (TX shaping -> channel impairments (CFO 0.05, delay 4.5) -> RX
synchronization + FEC decode), QPSK-S_8/9, NMS-10, Eb/N0 = 4.0 dB, one chip
— the north-star metric (BASELINE.json targets dvbs2_tx_rx frames/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 0.22 Mb/s — the reference's full-chain SIM_THR on its multi-core
x86 host (refs/TX_RX/QPSK_8_9_freq_005_delay_45.txt last rows, SPA-50
decoder; see BASELINE.md.  The BB-chain metric BENCH_r01 tracked — ref
baseline 24.5 Mb/s — is also measured and written to BENCH_EXTRA.json
together with the full-chain number).

Measurement notes (tunneled dev TPU): `block_until_ready` does NOT force
execution through the axon tunnel (results materialize lazily on value
fetch), and (executable, inputs) pairs are memoized. So the harness (a)
salts PRNG keys with wall-clock nanoseconds, (b) chains all steps of a run
inside ONE jitted `lax.scan` (threading the stream state) and fetches the
aggregated error counter to the host — forcing real end-to-end execution —
and (c) times two run lengths and uses the difference, which cancels the
tunnel round-trip and dispatch overhead.
"""
from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

FULL_BASELINE_MBPS = 0.22      # refs/TX_RX QPSK_8_9 freq_005_delay_45 SIM_THR
BB_BASELINE_MBPS = 24.5        # refs/TX_RX_BB/QPSK_8_9.txt:41


def _timed_diff(run, key, n_short, n_long, n_win):
    """Best-of-windows (long - short)/(n_long - n_short) step time."""
    int(run(n_short, key)[0])          # compile + warm
    int(run(n_long, key)[0])
    best = float("inf")
    for w in range(n_win):
        kw = jax.random.fold_in(key, 1000 + w)
        t0 = time.perf_counter()
        int(run(n_short, kw)[0])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run(n_long, kw)[0])
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (n_long - n_short))
    return best


def bench_bb(salt: int) -> float:
    from dvbs2_tpu.config import Config
    from dvbs2_tpu.chains.txrx_bb import txrx_bb_step

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem="NMS", ldpc_nite=10)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))

    @functools.partial(jax.jit, static_argnums=0)
    def run(n_steps, key):
        def body(carry, i):
            r = txrx_bb_step(jax.random.fold_in(key, i), sigma, cfg, batch)
            be, fe = carry
            return (be + r.be, fe + r.fe), None
        c, _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(0)),
                            jnp.arange(n_steps))
        return c

    dt = _timed_diff(run, jax.random.key(salt), 2, 12, 3)
    return batch * cfg.K_bch / dt / 1e6


def bench_full(salt: int, implem: str = "NMS", n_ite: int = 10) -> float:
    from dvbs2_tpu.config import Config
    from dvbs2_tpu.chains import txrx

    # geometry re-tuned on the TPU each round (round 5: after the
    # fir_mm/extract/BCH stage fixes the step got cheaper per frame, so
    # deeper steps amortize the fixed costs further — F swept 32->88,
    # 306 Mb/s at F=88; F=96 exceeds HBM by ~0.3 GB.  History: round 3
    # tools/probe_geom.py picked 128x32; round-5 sweep in ROOFLINE.md)
    B = int(os.environ.get("BENCH_FULL_STREAMS", "128"))
    F = int(os.environ.get("BENCH_FULL_FRAMES", "88"))
    hold = int(os.environ.get("BENCH_FULL_HOLD", "404"))
    cfg = Config(modcod="QPSK-S_8/9", ldpc_implem=implem, ldpc_nite=n_ite,
                 chn_max_freq_shift=0.05, chn_max_delay=4.5,
                 stm_hold_size=hold)
    sigma = jnp.float32(cfg.ebn0_to_sigma(4.0))
    state0 = txrx.txrx_init(cfg, B)
    # acquisition is a one-off per SNR point in the reference harness too —
    # excluded from steady-state throughput (like SIM_THR excludes setup);
    # shortened learning phases: lock quality doesn't change step timing
    state0 = txrx.acquire(jax.random.key(salt), sigma, cfg, state0, B,
                          max_waiting=60, learn12=40, learn3=40)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n_steps, key):
        def body(carry, i):
            be, fe, st = carry
            r = txrx.txrx_step(jax.random.fold_in(key, i), sigma, cfg, st,
                               B, F)
            return (be + r.be, fe + r.fe, r.state), None
        (be, fe, _st), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0), state0), jnp.arange(n_steps))
        return be, fe

    dt = _timed_diff(run, jax.random.key(salt + 1), 1, 5, 3)
    return B * F * cfg.K_bch / dt / 1e6


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    salt = time.time_ns() % (2**31)
    full_mbps = bench_full(salt)
    bb_mbps = bench_bb(salt)
    extra = {
        "full_chain_info_throughput_qpsk89_nms10_mbps": round(full_mbps, 3),
        "full_chain_vs_ref_spa50": round(full_mbps / FULL_BASELINE_MBPS, 1),
        "bb_chain_info_throughput_qpsk89_nms10_mbps": round(bb_mbps, 3),
        "bb_vs_ref_spa50": round(bb_mbps / BB_BASELINE_MBPS, 3),
        "note": ("full chain = TX shaping + channel (CFO 0.05, delay "
                 "4.5) + RX sync + NMS-10 decode, steady-state after "
                 "acquisition, one chip, ULTRA blocked Gardner; refs are "
                 "the reference's multi-threaded x86 SIM_THR (SPA-50)"),
    }
    path = os.path.join(os.path.dirname(__file__), "BENCH_EXTRA.json")
    if os.environ.get("BENCH_SPA50"):
        # apples-to-apples column: same decoder config as the refs
        spa_mbps = bench_full(salt + 7, implem="SPA", n_ite=50)
        extra["full_chain_info_throughput_qpsk89_spa50_mbps"] = \
            round(spa_mbps, 3)
        extra["full_chain_spa50_vs_ref_spa50"] = \
            round(spa_mbps / FULL_BASELINE_MBPS, 1)
    if os.path.exists(path):
        # keep any previously measured/annotated keys this run didn't
        # produce (SPA-50 column, provenance notes, ...) across re-runs
        try:
            old = json.load(open(path))
            for k, v in old.items():
                extra.setdefault(k, v)
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(extra, f, indent=1)
    print(json.dumps({
        "metric": "full_chain_info_throughput_qpsk89_nms10",
        "value": round(full_mbps, 3),
        "unit": "Mb/s",
        "vs_baseline": round(full_mbps / FULL_BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
