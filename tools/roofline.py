#!/usr/bin/env python
"""Speed-of-light / roofline analysis for the hot kernels (round-5
VERDICT item 2; BASELINE.json north star: "filter and decoder kernels
hit speed-of-light per chip").

Method: the chip's practical ceilings are MEASURED, not quoted — three
microbenchmarks establish (1) HBM stream bandwidth, (2) VPU f32
elementwise throughput, (3) MXU matmul throughput (f32/bf16) — then
each production kernel's resource demand is counted analytically from
its actual instruction structure and divided by the measured ceiling:

* NMS-10 LDPC kernel (ops/ldpc_pallas.py): HBM bytes = one (16200, F)
  f32 LLR load + one posterior store per frame; VPU ops counted per edge
  from the two-pass layer update (see _nms_ops_per_frame) x iterations.
  The decode state is VMEM-resident, so the bound is
  max(HBM time, VPU time) per F_BLK block.
* fused RX front-end (ops/frontend_pallas.py): MXU flops of the banded
  matched-filter matmul + VPU ops of the mix/Gardner body + the
  transcendental (sin/cos) cost of the DDS, with the per-block
  sequential dependency called out.

TIMING DISCIPLINE (important on the tunneled dev TPU): repeated
independent dispatches OVERLAP on this backend and report impossible
throughput (measured ~45x the HBM spec), and python-side dependency
chaining of separate dispatches does not serialize either.  Every
benchmark therefore iterates INSIDE one compiled program — a
lax.fori_loop/scan whose body carries a data dependency — so XLA's
while-loop semantics guarantee K sequential full passes; one execution
is timed end-to-end and the per-dispatch overhead (measured separately)
is subtracted.

Writes ROOFLINE.json; prose in ROOFLINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


_FETCH = None


def _sync(r):
    """Force completion by FETCHING A VALUE derived from the result —
    jax.block_until_ready does not actually wait on the tunneled dev
    backend (measured: every 'timing' collapsed to the ~84 us dispatch
    overhead regardless of workload).  A tiny dependent reduction +
    host transfer is the only reliable barrier."""
    global _FETCH
    if _FETCH is None:
        _FETCH = jax.jit(lambda x: jnp.sum(x.ravel()[:8]))
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(_FETCH(leaf))


_RTT = 0.0


def _time_exec(fn, *args, n=3, warmup=1):
    """Wall time of one execution of fn (averaged over n, after warmup),
    each repetition synchronized by a value fetch (_sync), with the
    measured fetch round trip (~25 ms through the tunnel) subtracted.
    Callers size their internal iteration counts so one execution is
    >> the RTT.  fn must do its own internal iteration."""
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.perf_counter() - t0) / n - _RTT
    return max(dt, 1e-9)


def bench_dispatch_overhead():
    """Per-dispatch round trip (tunnel RTT + runtime) via a trivial jit
    with a value fetch (the only true barrier on this backend)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    for _ in range(3):
        float(f(x))
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        float(f(x))
    return (time.perf_counter() - t0) / n


def bench_hbm_bw(mb=512, k=256):
    """HBM stream bandwidth: k sequential full passes (read+write) over
    an mb-MB array inside ONE while loop (bodies can't fuse across
    iterations)."""
    n = mb * 1024 * 1024 // 4

    @jax.jit
    def f(x):
        def body(i, x):
            return x * np.float32(1.0000001) + np.float32(1e-9)
        return jax.lax.fori_loop(0, k, body, x)

    x = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    dt = _time_exec(f, x)
    return 2 * n * 4 * k / dt      # bytes/s


def bench_vpu_f32(iters=8_000_000, shape=(8, 128), chains=16):
    """VPU f32 throughput ceiling: REGISTER-resident Pallas kernel
    running ``chains`` INDEPENDENT fma chains per loop iteration (2 f32
    ops each).  Design notes from measurement: a single dependent chain
    measures fma latency not issue rate (0.8 Top/s), and accumulator
    sets larger than the vector register file spill to VMEM and drop to
    ~1.1 Top/s — 16 independent (8,128) vreg chains sustain ~2.9 Top/s,
    the best measured elementwise rate on this chip."""
    from jax.experimental import pallas as pl

    cs = [np.float32(1.0 + 1e-7 * (i + 1)) for i in range(chains)]

    def kernel(x_ref, o_ref):
        def body(_, accs):
            return tuple(a * c + np.float32(1e-7)
                         for a, c in zip(accs, cs))
        accs = jax.lax.fori_loop(0, iters, body,
                                 tuple(x_ref[:] * c for c in cs))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out

    x = jax.jit(lambda: jnp.ones(shape, jnp.float32))()
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))
    dt = _time_exec(f, x)
    return x.size * chains * iters * 2 / dt      # f32 ops/s


def bench_mxu(dtype=jnp.bfloat16, m=4096, k=512):
    """MXU matmul throughput: k dependent matmuls inside one scan."""
    a = jax.jit(lambda: jnp.full((m, m), 0.5, dtype))()
    b = jax.jit(lambda: jnp.eye(m, dtype=dtype) * 2)()

    @jax.jit
    def f(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.float32)
            return (y * 0.5).astype(dtype), ()
        out, _ = jax.lax.scan(body, a, None, length=k)
        return out

    dt = _time_exec(f, a, b)
    return 2 * m * m * m * k / dt      # flops/s


def bench_transcendental(shape=(512, 1024), iters=4096):
    """Measured sin+cos pair throughput (the DDS cost unit)."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        def body(_, acc):
            return jnp.sin(acc) + jnp.cos(acc)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    x = jax.jit(lambda: jnp.ones(shape, jnp.float32))()
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))
    dt = _time_exec(f, x)
    return x.size * iters / dt          # sincos pairs/s


# ---------------------------------------------------------------------------
# analytic demand counts
# ---------------------------------------------------------------------------

def _nms_ops_per_frame(rate: str, n_ite: int):
    """VPU f32-op demand of ops/ldpc_pallas.py per frame per iteration,
    counted from the kernel's two passes over each layer's dc = d_r + 2
    edges on (360, F_BLK) tiles:

      pass 1 per edge: lq (roll + rold[sign 4 + select 2 + scale 2] +
        sub 1 ~ 10) + two-min/argmin/sign-parity update (~11) ~ 21 ops
      pass 2 per edge: delta (~18) + write-back roll+add (~2) ~ 20 ops
      syndrome per edge per iteration: ~2 (xor + cmp amortized)

    Per-edge total ~43 ops.  Edge count = (sum_r d_r + 2q) * 360.
    This counts the arithmetic the kernel actually issues, not minimal
    arithmetic — the roofline says how close the achieved rate is to the
    chip executing exactly this program at VPU speed."""
    from dvbs2_tpu.ops.ldpc import build_structs
    s = build_structs(rate)
    info_edges = sum(len(s.layer_edges[r]) for r in range(s.q)) * 360
    par_edges = 2 * s.q * 360
    edges = info_edges + par_edges
    ops_per_edge = 43
    return edges * ops_per_edge * n_ite, edges


def nms_bounds(meas, rate="8/9", n_ite=10):
    ops, edges = _nms_ops_per_frame(rate, n_ite)
    hbm_bytes = 2 * 16200 * 4            # LLR in + posterior out, f32
    t_vpu = ops / meas["vpu_f32_ops"]
    t_hbm = hbm_bytes / meas["hbm_bw"]
    return {
        "edges_per_frame": edges,
        "vpu_ops_per_frame": ops,
        "hbm_bytes_per_frame": hbm_bytes,
        "t_vpu_us_per_frame": t_vpu * 1e6,
        "t_hbm_us_per_frame": t_hbm * 1e6,
        "bound": "VPU" if t_vpu > t_hbm else "HBM",
        "t_bound_us_per_frame": max(t_vpu, t_hbm) * 1e6,
    }


def measure_nms(rate="8/9", n_ite=10, F=512, reps=32):
    """Achieved NMS decode time per frame: ``reps`` sequential decodes
    chained inside ONE scan (posterior feeds the next decode's LLR input
    — a true data dependency), syndrome exit off so every decode runs
    all iterations."""
    from dvbs2_tpu.ops import ldpc
    rng = np.random.RandomState(0)
    K = 14400 if rate == "8/9" else 9720
    bits = jnp.asarray(rng.randint(0, 2, (F, K)), jnp.int8)
    cw = ldpc.encode(bits, rate)
    llr = (1 - 2 * cw.astype(jnp.float32)) * 4.0 + jnp.asarray(
        rng.randn(F, 16200), jnp.float32)

    @jax.jit
    def f(llr):
        def body(x, _):
            p = ldpc.decode(x, rate, n_ite=n_ite, implem="NMS",
                            syndrome_exit=False)
            return jnp.clip(p, -20.0, 20.0), ()
        out, _ = jax.lax.scan(body, llr, None, length=reps)
        return out

    dt = _time_exec(f, llr)
    return dt / (F * reps)


def frontend_bounds(meas, B=128, F=32, L=8370, osf=2, taps=81, hold=384):
    """Fused front-end demand per sample per stream:

      DDS: 1 sincos pair + ~6 mul/add (mix) per sample
      AGC scale: ~2
      MF: banded matmul, 2 (cplx planes) * 2*taps flops per sample (MXU)
      Gardner body: ~24 VPU ops per sample (Farrow 8, TED 6, PI/prefix
        ~6 amortized, select/strobe 4)

    plus the sequential dependency: nblk = N/hold blocks run strictly in
    order per stream tile."""
    N = F * L * osf
    samples = B * N
    mf_flops = samples * 2 * 2 * taps
    vpu_ops = samples * (6 + 2 + 24)
    sincos = samples
    hbm_bytes = samples * 2 * 4 * 2      # in + out, (re,im) f32
    t = {
        "t_mxu_ms": mf_flops / meas["mxu_f32"] * 1e3,
        "t_vpu_ms": vpu_ops / meas["vpu_f32_ops"] * 1e3,
        "t_sincos_ms": sincos / meas["sincos_rate"] * 1e3,
        "t_hbm_ms": hbm_bytes / meas["hbm_bw"] * 1e3,
    }
    tmax = max(t.values())
    binding = [k for k, v in t.items() if v == tmax][0]
    return {
        "samples": samples, "mf_flops": mf_flops, "vpu_ops": vpu_ops,
        "hbm_bytes": hbm_bytes, **t,
        "bound": binding.replace("t_", "").replace("_ms", "").upper(),
        "t_bound_ms": tmax,
        "nblk_sequential": N // hold,
    }


def measure_frontend(B=128, F=32, hold=404, reps=16):
    """Achieved fused front-end time: reps chained executions inside one
    scan (output samples feed the next call's input — true dependency;
    sync state threads through as well)."""
    from dvbs2_tpu.config import Config
    from dvbs2_tpu.ops import frontend_pallas, sync, filters
    cfg = Config(modcod="QPSK-S_8/9", stm_hold_size=hold)
    L = cfg.pl_frame_size
    N = F * L * cfg.shp_osf
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, 2) * 0.3, jnp.float32)
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    coarse = sync.coarse_init(B, L)
    coarse = coarse._replace(nu=jnp.full((B,), 1e-4, jnp.float32))
    mf = jnp.zeros((B, len(taps) - 1, 2), jnp.float32)
    gst = sync.gardner_init(B, cfg.shp_osf)

    @jax.jit
    def f(x, coarse, mf, gst):
        def body(carry, _):
            x, coarse, mf, gst = carry
            y, strobe, c2, mf2, g2 = frontend_pallas.frontend(
                x, cfg, coarse, mf, gst)
            return (y, c2, mf2, g2), ()
        carry, _ = jax.lax.scan(body, (x, coarse, mf, gst), None,
                                length=reps)
        return carry[0]

    dt = _time_exec(f, x, coarse, mf, gst)
    return dt / reps, B * N


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="ROOFLINE.json")
    p.add_argument("--skip-measure", action="store_true",
                   help="bounds only (no production-kernel timing)")
    args = p.parse_args()

    plat = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} ({plat})", flush=True)

    global _RTT
    meas = {}
    _RTT = bench_dispatch_overhead()
    meas["dispatch_overhead_us"] = _RTT * 1e6
    print(f"dispatch:       {meas['dispatch_overhead_us']:8.0f} us",
          flush=True)
    meas["hbm_bw"] = bench_hbm_bw()
    print(f"HBM stream BW:  {meas['hbm_bw']/1e9:8.1f} GB/s", flush=True)
    meas["vpu_f32_ops"] = bench_vpu_f32()
    print(f"VPU f32:        {meas['vpu_f32_ops']/1e12:8.2f} Top/s", flush=True)
    meas["mxu_f32"] = bench_mxu(jnp.float32)
    print(f"MXU f32:        {meas['mxu_f32']/1e12:8.2f} TFLOP/s", flush=True)
    meas["mxu_bf16"] = bench_mxu(jnp.bfloat16)
    print(f"MXU bf16:       {meas['mxu_bf16']/1e12:8.2f} TFLOP/s", flush=True)
    meas["sincos_rate"] = bench_transcendental()
    print(f"sincos:         {meas['sincos_rate']/1e9:8.2f} Gpair/s",
          flush=True)

    out = {"device": str(jax.devices()[0]), "measured_ceilings": meas}

    # ---- NMS-10 --------------------------------------------------------
    nb = nms_bounds(meas)
    out["nms10_8_9"] = nb
    if not args.skip_measure:
        t_meas = measure_nms()
        nb["t_meas_us_per_frame"] = t_meas * 1e6
        nb["fraction_of_bound"] = nb["t_bound_us_per_frame"] / (t_meas * 1e6)
        print(f"NMS-10 8/9: bound {nb['t_bound_us_per_frame']:.2f} us/frame "
              f"({nb['bound']}), measured {t_meas*1e6:.2f} us/frame "
              f"-> {100*nb['fraction_of_bound']:.0f}% of speed-of-light",
              flush=True)

    # ---- fused front-end ----------------------------------------------
    fb = frontend_bounds(meas)
    out["frontend"] = fb
    if not args.skip_measure and plat != "cpu":
        dt, samples = measure_frontend()
        fb["t_meas_ms"] = dt * 1e3
        fb["fraction_of_bound"] = fb["t_bound_ms"] / (dt * 1e3)
        fb["samples_per_s"] = samples / dt
        print(f"front-end: bound {fb['t_bound_ms']:.2f} ms ({fb['bound']}), "
              f"measured {dt*1e3:.2f} ms "
              f"-> {100*fb['fraction_of_bound']:.0f}% of speed-of-light",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
