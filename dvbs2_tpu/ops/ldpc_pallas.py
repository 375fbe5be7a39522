"""Pallas TPU kernel: layered normalized-min-sum LDPC decoder.

The flagship kernel (BASELINE.json names it explicitly). For a block of
F_BLK=128 frames the ENTIRE decode working set lives in VMEM:

    posteriors  (16200, 128) f32   8.3 MB   (info groups + parity planes)
    check state (q*360, 128) x4    ~3 MB    (min1, min2, argmin, signs)

so after the initial LLR load there is ZERO HBM traffic until the final
posterior store — the decoder runs at VPU speed instead of HBM speed. Layer
updates use the same roll-only QC identity as ops/ldpc.py (layer r sees
group g cyclically rolled by a//q; tables guarantee one edge per group per
layer), with ``pltpu.roll`` for the static sublane rotations. The grid
iterates over F-blocks; each block decodes its own frames independently
(the INTER batch strategy, one block per grid step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvbs2_tpu.data.ldpc_tables import GROUP, N_LDPC
from dvbs2_tpu.ops.ldpc import build_structs

F_BLK = 128
_BIG = 1e9
_DEBUG_PRINT = False


def _roll(x, shift):
    """Static cyclic roll along the sublane axis (non-negative shift)."""
    shift = shift % x.shape[0]
    if shift == 0:
        return x
    return pltpu.roll(x, shift=shift, axis=0)


def _make_kernel(rate: str, n_ite: int, alpha: float,
                 syndrome_exit: bool = True):
    s = build_structs(rate)
    G, q = s.n_groups, s.q
    K = s.K
    a = np.float32(alpha)

    def kernel(llr_hbm, out_hbm, L_ref, m1_ref, m2_ref, am_ref, sg_ref,
               sem_in, sem_out):
        # llr rows arrive already plane-major (caller permutes): [0, K) info
        # by group; [K, K + q*360) parity planes (plane r = rows of
        # p_{r + q t}, t = 0..359). The block's LLRs are DMA'd straight into
        # the VMEM working buffer — no separate staging buffers, so the
        # whole decode state fits the 16MB VMEM budget at F_BLK=128.
        blk = pl.program_id(0)
        cols = pl.ds(blk * F_BLK, F_BLK)
        load = pltpu.make_async_copy(llr_hbm.at[:, cols], L_ref, sem_in)
        load.start()
        load.wait()
        zero = jnp.zeros((q * GROUP, F_BLK), jnp.float32)
        m1_ref[:] = zero
        m2_ref[:] = zero
        am_ref[:] = jnp.zeros((q * GROUP, F_BLK), jnp.int32)
        sg_ref[:] = jnp.zeros((q * GROUP, F_BLK), jnp.int32)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (GROUP, F_BLK), 0)

        def info_rows(g):
            return slice(g * GROUP, (g + 1) * GROUP)

        def par_rows(r):
            return slice(K + r * GROUP, K + (r + 1) * GROUP)

        def one_layer(r):
            edges = s.layer_edges[r]
            d_r = len(edges)
            dc = d_r + 2
            m1r = m1_ref[r * GROUP:(r + 1) * GROUP]
            m2r = m2_ref[r * GROUP:(r + 1) * GROUP]
            amr = am_ref[r * GROUP:(r + 1) * GROUP]
            sgr = sg_ref[r * GROUP:(r + 1) * GROUP]

            def rold(e):
                sign = 1.0 - 2.0 * ((sgr >> e) & 1).astype(jnp.float32)
                mag = jnp.where(amr == e, m2r, m1r)
                return a * sign * mag

            def lq(e):
                """Extrinsic input for edge e, read fresh from the refs
                (pass 1 only reads, pass 2 only writes)."""
                if e < d_r:
                    g, sh = edges[e]
                    return _roll(L_ref[info_rows(g)], sh) - rold(e)
                if e == d_r:
                    return L_ref[par_rows(r)] - rold(d_r)
                if r > 0:
                    prev_in = L_ref[par_rows(r - 1)]
                else:
                    prev_in = jnp.where(row_ids == 0, _BIG,
                                        _roll(L_ref[par_rows(q - 1)], 1))
                return prev_in - rold(d_r + 1)

            # pass 1 — incremental two-min + argmin + sign parity + packed
            # input signs (unrolled; Mosaic has no cumsum/argmin lowering).
            # Only the reduction planes stay live, keeping VMEM stack small.
            inf = jnp.full((GROUP, F_BLK), np.inf, jnp.float32)
            nm1, nm2 = inf, inf
            nam = jnp.zeros((GROUP, F_BLK), jnp.int32)
            sp = jnp.zeros((GROUP, F_BLK), jnp.bool_)
            nneg = jnp.zeros((GROUP, F_BLK), jnp.int32)
            for e in range(dc):
                v = lq(e)
                m = jnp.abs(v)
                new_min = m < nm1
                nm2 = jnp.where(new_min, nm1, jnp.minimum(nm2, m))
                nam = jnp.where(new_min, e, nam)
                nm1 = jnp.minimum(nm1, m)
                neg = v < 0
                sp = jnp.logical_xor(sp, neg)
                nneg = nneg | (neg.astype(jnp.int32) << e)
            nm2 = jnp.where(jnp.isinf(nm2), nm1, nm2)

            # pass 2 — DELTA write-back (L += roll^-1(R_new - R_old)): no Lq
            # recompute, so groups appearing twice in a layer (repeated
            # residues in a table row) accumulate correctly.
            nsg = jnp.zeros((GROUP, F_BLK), jnp.int32)

            def delta(e):
                nonlocal nsg
                bite = jnp.logical_xor(sp, ((nneg >> e) & 1) == 1)
                nsg = nsg | (bite.astype(jnp.int32) << e)
                sign = 1.0 - 2.0 * bite.astype(jnp.float32)
                mag = jnp.where(nam == e, nm2, nm1)
                return a * sign * mag - rold(e)

            L_ref[par_rows(r)] = L_ref[par_rows(r)] + delta(d_r)
            d_prev = delta(d_r + 1)
            if r > 0:
                L_ref[par_rows(r - 1)] = L_ref[par_rows(r - 1)] + d_prev
            else:
                # row 359 of the rolled-back block is check 0's missing
                # p_{-1} edge: contributes nothing
                back = jnp.where(row_ids == GROUP - 1, 0.0, _roll(d_prev, -1))
                L_ref[par_rows(q - 1)] = L_ref[par_rows(q - 1)] + back
            for e in range(d_r):
                g, sh = edges[e]
                L_ref[info_rows(g)] = (L_ref[info_rows(g)]
                                       + _roll(delta(e), -sh))
            m1_ref[r * GROUP:(r + 1) * GROUP] = nm1
            m2_ref[r * GROUP:(r + 1) * GROUP] = nm2
            am_ref[r * GROUP:(r + 1) * GROUP] = nam
            sg_ref[r * GROUP:(r + 1) * GROUP] = nsg

        def synd_unsat():
            # exact END-OF-ITERATION posterior syndrome (aff3ct's
            # check_syndrome_soft semantics) — a mid-sweep accumulation can
            # false-exit on non-codewords, see ops/ldpc.py
            n_unsat = jnp.int32(0)
            for r in range(q):
                par = L_ref[par_rows(r)] < 0
                for (g, sh) in s.layer_edges[r]:
                    par = jnp.logical_xor(
                        par, _roll(L_ref[info_rows(g)], sh) < 0)
                if r > 0:
                    prev_in = L_ref[par_rows(r - 1)]
                else:
                    prev_in = jnp.where(row_ids == 0, _BIG,
                                        _roll(L_ref[par_rows(q - 1)], 1))
                par = jnp.logical_xor(par, prev_in < 0)
                n_unsat = n_unsat + jnp.sum(par.astype(jnp.int32))
            return n_unsat

        def body(carry):
            i, done = carry
            for r in range(q):
                one_layer(r)
            if syndrome_exit:
                n_unsat = synd_unsat()
                done = n_unsat == 0
                if _DEBUG_PRINT:
                    pl.debug_print("ite {} n_unsat {}", i, n_unsat)
            return (i + 1, done)

        def cond(carry):
            i, done = carry
            keep = i < n_ite
            if syndrome_exit:
                keep = jnp.logical_and(keep, jnp.logical_not(done))
            return keep

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))
        store = pltpu.make_async_copy(L_ref, out_hbm.at[:, cols], sem_out)
        store.start()
        store.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(rate: str, n_ite: int, alpha: float, n_blocks: int,
                interpret: bool, syndrome_exit: bool = True):
    kernel = _make_kernel(rate, n_ite, alpha, syndrome_exit)
    s = build_structs(rate)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N_LDPC, n_blocks * F_BLK),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_LDPC, F_BLK), jnp.float32),   # L (K info + q*360 par)
            pltpu.VMEM((s.q * GROUP, F_BLK), jnp.float32),  # m1
            pltpu.VMEM((s.q * GROUP, F_BLK), jnp.float32),  # m2
            pltpu.VMEM((s.q * GROUP, F_BLK), jnp.int32),    # argmin
            pltpu.VMEM((s.q * GROUP, F_BLK), jnp.int32),    # signs
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


F_BLK_SPA = 128


def _make_kernel_spa(rate: str, n_ite: int, syndrome_exit: bool = True):
    """Layered SUM-PRODUCT kernel (exact phi update, the reference refs'
    decoder config: --dec-implem SPA, DVBS2.cpp:428-437).

    Unlike min-sum, SPA check messages don't compress to (min1,min2,argmin),
    so the per-edge check->var messages R persist across layers.  The full R
    tensor ((q, dc*368, 128) signed bfloat16) doesn't fit VMEM next to the
    posteriors, but only ONE layer's plane is live at a time — so R lives in
    an HBM scratch and each layer's plane is DMA-streamed through a single
    VMEM buffer (2.5MB @ 8/9).  The DMA is ~7us against ~1ms of
    transcendental-heavy layer compute, so streaming is effectively free.
    bf16 message storage is a ~0.4% relative quantization, measured
    FER-neutral vs the f32 XLA path (tests/test_ldpc_pallas.py).  R planes
    are padded to 368 rows so each edge plane starts 16-row aligned, and the
    very first iteration substitutes R=0 instead of reading the
    uninitialized scratch."""
    s = build_structs(rate)
    G, q = s.n_groups, s.q
    K = s.K
    RP = 368                                 # padded plane stride (16-aligned)

    def phi(x):
        return -jnp.log(jnp.tanh(0.5 * jnp.clip(x, 1e-9, 30.0)))

    def kernel(llr_hbm, R_hbm_in, out_hbm, R_hbm, L_ref, Rbuf, phi_ref,
               sem_in, sem_out, sem_r):
        # R_hbm is the output alias of R_hbm_in (HBM scratch memrefs aren't
        # supported by Mosaic, so the R state rides an aliased in/out pair;
        # grid steps run sequentially and iteration 0 substitutes R=0, so
        # one buffer serves every block)
        del R_hbm_in
        blk = pl.program_id(0)
        cols = pl.ds(blk * F_BLK_SPA, F_BLK_SPA)
        load = pltpu.make_async_copy(llr_hbm.at[:, cols], L_ref, sem_in)
        load.start()
        load.wait()

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, F_BLK_SPA), 0)

        def info_rows(g):
            return slice(g * GROUP, (g + 1) * GROUP)

        def par_rows(r):
            return slice(K + r * GROUP, K + (r + 1) * GROUP)

        def one_layer(r, first):
            edges = s.layer_edges[r]
            d_r = len(edges)
            dc = d_r + 2
            rload = pltpu.make_async_copy(R_hbm.at[r], Rbuf, sem_r)
            rload.start()
            rload.wait()

            def rold(e):
                raw = Rbuf[e * RP:e * RP + GROUP].astype(jnp.float32)
                # iteration 0 reads uninitialized scratch: substitute R=0
                return jnp.where(first, 0.0, raw)

            def lq(e):
                if e < d_r:
                    g, sh = edges[e]
                    return _roll(L_ref[info_rows(g)], sh) - rold(e)
                if e == d_r:
                    return L_ref[par_rows(r)] - rold(d_r)
                if r > 0:
                    prev_in = L_ref[par_rows(r - 1)]
                else:
                    prev_in = jnp.where(row_ids == 0, _BIG,
                                        _roll(L_ref[par_rows(q - 1)], 1))
                return prev_in - rold(d_r + 1)

            # pass 1 — phi magnitudes (kept in scratch) + total + sign
            # parity + packed input signs.  T accumulates the bf16-ROUNDED
            # phis: pass 2 computes phi(T - pe) with pe read back from the
            # bf16 scratch, and if T summed unrounded f32 values the
            # subtraction would leave the ROUNDING ERROR of the dominant
            # edge (catastrophic cancellation when one weak input's phi
            # dwarfs the rest — exactly the high-SNR operating points);
            # with rounded accumulation T - pe == sum of the other edges'
            # rounded phis, i.e. plain ~0.4% input noise instead.
            T = jnp.zeros((GROUP, F_BLK_SPA), jnp.float32)
            sp = jnp.zeros((GROUP, F_BLK_SPA), jnp.bool_)
            nneg = jnp.zeros((GROUP, F_BLK_SPA), jnp.int32)
            for e in range(dc):
                v = lq(e)
                p = phi(jnp.abs(v)).astype(jnp.bfloat16)
                phi_ref[e * GROUP:(e + 1) * GROUP] = p
                T = T + p.astype(jnp.float32)
                neg = v < 0
                sp = jnp.logical_xor(sp, neg)
                nneg = nneg | (neg.astype(jnp.int32) << e)

            # pass 2 — R_new = sign * phi(T - phi_e), DELTA write-back
            # (correct for groups appearing twice in one layer); each Rbuf
            # slice is read (rold) before being overwritten with R_new.
            def delta(e):
                sign = 1.0 - 2.0 * jnp.logical_xor(
                    sp, ((nneg >> e) & 1) == 1).astype(jnp.float32)
                pe = phi_ref[e * GROUP:(e + 1) * GROUP].astype(jnp.float32)
                rnew = sign * phi(T - pe)
                d = rnew - rold(e)
                Rbuf[e * RP:e * RP + GROUP] = rnew.astype(jnp.bfloat16)
                return d

            L_ref[par_rows(r)] = L_ref[par_rows(r)] + delta(d_r)
            d_prev = delta(d_r + 1)
            if r > 0:
                L_ref[par_rows(r - 1)] = L_ref[par_rows(r - 1)] + d_prev
            else:
                back = jnp.where(row_ids == GROUP - 1, 0.0, _roll(d_prev, -1))
                L_ref[par_rows(q - 1)] = L_ref[par_rows(q - 1)] + back
            for e in range(d_r):
                g, sh = edges[e]
                L_ref[info_rows(g)] = (L_ref[info_rows(g)]
                                       + _roll(delta(e), -sh))

            rstore = pltpu.make_async_copy(Rbuf, R_hbm.at[r], sem_r)
            rstore.start()
            rstore.wait()

        def synd_unsat():
            # exact end-of-iteration posterior syndrome (see ops/ldpc.py)
            n_unsat = jnp.int32(0)
            for r in range(q):
                par = L_ref[par_rows(r)] < 0
                for (g, sh) in s.layer_edges[r]:
                    par = jnp.logical_xor(
                        par, _roll(L_ref[info_rows(g)], sh) < 0)
                if r > 0:
                    prev_in = L_ref[par_rows(r - 1)]
                else:
                    prev_in = jnp.where(row_ids == 0, _BIG,
                                        _roll(L_ref[par_rows(q - 1)], 1))
                par = jnp.logical_xor(par, prev_in < 0)
                n_unsat = n_unsat + jnp.sum(par.astype(jnp.int32))
            return n_unsat

        def body(carry):
            i, done = carry
            for r in range(q):
                one_layer(r, i == 0)
            if syndrome_exit:
                done = synd_unsat() == 0
            return (i + 1, done)

        def cond(carry):
            i, done = carry
            keep = i < n_ite
            if syndrome_exit:
                keep = jnp.logical_and(keep, jnp.logical_not(done))
            return keep

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))
        store = pltpu.make_async_copy(L_ref, out_hbm.at[:, cols], sem_out)
        store.start()
        store.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call_spa(rate: str, n_ite: int, n_blocks: int,
                    interpret: bool, syndrome_exit: bool = True):
    kernel = _make_kernel_spa(rate, n_ite, syndrome_exit)
    s = build_structs(rate)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((N_LDPC, n_blocks * F_BLK_SPA),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((s.q, s.max_dc * 368, F_BLK_SPA),
                                        jnp.bfloat16)],
        input_output_aliases={1: 1},
        scratch_shapes=[
            pltpu.VMEM((N_LDPC, F_BLK_SPA), jnp.float32),        # posteriors
            pltpu.VMEM((s.max_dc * 368, F_BLK_SPA), jnp.bfloat16),  # R (1 layer)
            pltpu.VMEM((s.max_dc * GROUP, F_BLK_SPA), jnp.bfloat16),  # phi
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def decode_spa(llr: jnp.ndarray, rate: str, n_ite: int = 50,
               interpret: bool = False,
               syndrome_exit: bool = True) -> jnp.ndarray:
    """(F, N) channel LLRs -> (F, N) posteriors, layered sum-product."""
    s = build_structs(rate)
    K, q = s.K, s.q
    F, N = llr.shape
    assert N == N_LDPC
    Fp = ((F + F_BLK_SPA - 1) // F_BLK_SPA) * F_BLK_SPA
    lt = llr.T.astype(jnp.float32)
    if Fp != F:
        lt = jnp.pad(lt, ((0, 0), (0, Fp - F)))
    par = lt[K:].reshape(GROUP, q, Fp).transpose(1, 0, 2).reshape(q * GROUP, Fp)
    lt = jnp.concatenate([lt[:K], par], axis=0)
    call = _build_call_spa(rate, n_ite, Fp // F_BLK_SPA, interpret,
                           syndrome_exit)
    rstate = jnp.zeros((s.q, s.max_dc * 368, F_BLK_SPA), jnp.bfloat16)
    out, _ = call(lt, rstate)
    out_par = out[K:].reshape(q, GROUP, Fp).transpose(1, 0, 2).reshape(
        s.NmK, Fp)
    out = jnp.concatenate([out[:K], out_par], axis=0)
    return out[:, :F].T


def decode_nms(llr: jnp.ndarray, rate: str, n_ite: int = 10,
               norm_factor: float = 0.875,
               interpret: bool = False,
               syndrome_exit: bool = True) -> jnp.ndarray:
    """(F, N) channel LLRs -> (F, N) posteriors; F padded to 128 blocks.

    With ``syndrome_exit`` each 128-frame block stops iterating as soon as
    all of ITS frames satisfy every parity check — finer-grained than the
    XLA path's whole-batch exit, so high-SNR batches pay only for their
    slowest 128-frame block rather than the slowest frame overall.
    """
    s = build_structs(rate)
    K, q = s.K, s.q
    F, N = llr.shape
    assert N == N_LDPC
    Fp = ((F + F_BLK - 1) // F_BLK) * F_BLK
    lt = llr.T.astype(jnp.float32)
    if Fp != F:
        lt = jnp.pad(lt, ((0, 0), (0, Fp - F)))
    # permute parity rows to plane-major for the kernel (pure reshapes)
    par = lt[K:].reshape(GROUP, q, Fp).transpose(1, 0, 2).reshape(q * GROUP, Fp)
    lt = jnp.concatenate([lt[:K], par], axis=0)
    call = _build_call(rate, n_ite, float(norm_factor), Fp // F_BLK,
                       interpret, syndrome_exit)
    out = call(lt)
    out_par = out[K:].reshape(q, GROUP, Fp).transpose(1, 0, 2).reshape(
        s.NmK, Fp)
    out = jnp.concatenate([out[:K], out_par], axis=0)
    return out[:, :F].T
