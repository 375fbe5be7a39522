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
    G, q, dc, d_info = s.n_groups, s.q, s.dc, s.dc - 2
    K = s.K
    groups, shifts = s.layer_groups, s.layer_shifts
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
            m1r = m1_ref[r * GROUP:(r + 1) * GROUP]
            m2r = m2_ref[r * GROUP:(r + 1) * GROUP]
            amr = am_ref[r * GROUP:(r + 1) * GROUP]
            sgr = sg_ref[r * GROUP:(r + 1) * GROUP]

            def rold(e):
                sign = 1.0 - 2.0 * ((sgr >> e) & 1).astype(jnp.float32)
                mag = jnp.where(amr == e, m2r, m1r)
                return a * sign * mag

            def lq(e):
                """Extrinsic input for edge e, read fresh from the refs —
                valid until L_ref[group(e)] is overwritten in pass 2 (each
                group appears at most once per layer)."""
                if e < d_info:
                    g, sh = int(groups[r, e]), int(shifts[r, e])
                    return _roll(L_ref[info_rows(g)], sh) - rold(e)
                if e == d_info:
                    return L_ref[par_rows(r)] - rold(d_info)
                if r > 0:
                    prev_in = L_ref[par_rows(r - 1)]
                else:
                    prev_in = jnp.where(row_ids == 0, _BIG,
                                        _roll(L_ref[par_rows(q - 1)], 1))
                return prev_in - rold(d_info + 1)

            # pass 1 — incremental two-min + argmin + sign parity (unrolled;
            # Mosaic has no cumsum/argmin lowering). Only the four reduction
            # planes stay live, keeping the VMEM stack small.
            inf = jnp.full((GROUP, F_BLK), np.inf, jnp.float32)
            nm1, nm2 = inf, inf
            nam = jnp.zeros((GROUP, F_BLK), jnp.int32)
            sp = jnp.zeros((GROUP, F_BLK), jnp.bool_)
            for e in range(dc):
                v = lq(e)
                m = jnp.abs(v)
                new_min = m < nm1
                nm2 = jnp.where(new_min, nm1, jnp.minimum(nm2, m))
                nam = jnp.where(new_min, e, nam)
                nm1 = jnp.minimum(nm1, m)
                sp = jnp.logical_xor(sp, v < 0)
            nm2 = jnp.where(jnp.isinf(nm2), nm1, nm2)

            # pass 2 — recompute Lq_e, add the new message, write back.
            # Order: parity edges FIRST (their lq() reads L_ref[par_rows]
            # which pass 2 never needs again), then info edges.
            nsg = jnp.zeros((GROUP, F_BLK), jnp.int32)
            # hard-decision syndrome: parity of POSTERIOR signs over the
            # check's edges (v2c sign parity can stay odd at a fixpoint even
            # when the hard decisions form a valid codeword)
            hs = jnp.zeros((GROUP, F_BLK), jnp.bool_)

            def post(e):
                nonlocal nsg, hs
                v = lq(e)
                bite = jnp.logical_xor(sp, v < 0)
                nsg = nsg | (bite.astype(jnp.int32) << e)
                sign = 1.0 - 2.0 * bite.astype(jnp.float32)
                mag = jnp.where(nam == e, nm2, nm1)
                out = v + a * sign * mag
                hs = jnp.logical_xor(hs, out < 0)
                return out

            p_prev = post(d_info + 1)
            p_self = post(d_info)
            L_ref[par_rows(r)] = p_self
            if r > 0:
                L_ref[par_rows(r - 1)] = p_prev
            else:
                back = _roll(p_prev, -1)
                keep = L_ref[par_rows(q - 1)]
                L_ref[par_rows(q - 1)] = jnp.where(row_ids == GROUP - 1,
                                                   keep, back)
            for e in range(d_info):
                g, sh = int(groups[r, e]), int(shifts[r, e])
                L_ref[info_rows(g)] = _roll(post(e), -sh)
            m1_ref[r * GROUP:(r + 1) * GROUP] = nm1
            m2_ref[r * GROUP:(r + 1) * GROUP] = nm2
            am_ref[r * GROUP:(r + 1) * GROUP] = nam
            sg_ref[r * GROUP:(r + 1) * GROUP] = nsg
            # count of unsatisfied checks (odd posterior-sign parity); a full
            # -array integer sum lowers cheaply in Mosaic
            return jnp.sum(hs.astype(jnp.int32))

        def body(carry):
            i, _ = carry
            n_unsat = jnp.int32(0)
            for r in range(q):
                n_unsat = n_unsat + one_layer(r)
            if _DEBUG_PRINT:
                pl.debug_print("ite {} n_unsat {}", i, n_unsat)
            return (i + 1, n_unsat == 0)

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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
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
