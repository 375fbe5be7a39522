"""DVB-S2 short-frame LDPC codec, TPU-native.

Equivalent of aff3ct's ``LDPC_DVBS2`` IRA encoder + ``BP_HORIZONTAL_LAYERED``
decoder with SPA/MS/NMS update rules and the INTER SIMD strategy (reference:
src/common/Factory/DVBS2/DVBS2.cpp:418-449, CLI at :87-89) — re-designed for
TPU rather than translated.

Structure. DVB-S2 codes are quasi-cyclic IRA: info bit m of group g connects
to parity checks (a + m*q) mod (N-K) for each address a of the group's table
row, and the parity part is an accumulator chain (dual diagonal). Checks
split into q layers {c : c mod q == r} of 360 independent checks.

Key identity: within layer r, the info edge from table entry (g, a) with
a mod q == r connects check t (= (c-r)/q) to variable (g, (t - a//q) mod 360)
— i.e. the layer sees group g's 360 posteriors CYCLICALLY ROLLED by a//q.
With addresses distinct mod q within each row (guaranteed by our tables),
every layer touches each group at most once, so a full layer update is:

    roll -> subtract R -> check-update (phi/two-min over dc) -> write back

pure static rolls and elementwise VPU math on (360, F) blocks — NO gathers,
NO scatters, no write conflicts. The frame batch F rides the lane axis
(the reference's INTER strategy mapped onto the VPU). The encoder is a
static-gather XOR accumulation + cumulative-XOR accumulator (log-depth scan).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.data.ldpc_tables import GROUP, LdpcTable, N_LDPC, get_table


@dataclasses.dataclass(frozen=True)
class LdpcStructs:
    """Static per-rate structures shared by encoder and decoder.

    Layers are RAGGED: layer r has its own info-edge list (group, shift),
    a group may appear several times in one layer (a table row with
    repeated residues mod q — the genuine EN 302 307 tables have these),
    and per-layer check degrees differ.  Write-back therefore uses DELTA
    accumulation (L_g += roll^-1(R_new - R_old)) instead of posterior
    overwrite, which reduces to the same thing when a group appears once."""
    K: int
    q: int
    layer_edges: tuple        # per layer r: tuple of (group, shift) pairs
    max_dc: int               # max over layers of (len(edges) + 2)

    @property
    def NmK(self) -> int:
        return N_LDPC - self.K

    @property
    def n_groups(self) -> int:
        return self.K // GROUP

    def dc_r(self, r: int) -> int:
        return len(self.layer_edges[r]) + 2


@functools.lru_cache(maxsize=None)
def build_structs(rate: str) -> LdpcStructs:
    t: LdpcTable = get_table(rate)
    K, q = t.K, t.q
    layer_edges = []
    for r in range(q):
        edges = []
        for g, row in enumerate(t.rows):
            for a in row:
                if a % q == r:
                    edges.append((g, a // q))
        layer_edges.append(tuple(edges))
    max_dc = max(len(e) for e in layer_edges) + 2
    # packed sign words in the min-sum paths are int32
    assert max_dc <= 30, f"layer check degree {max_dc} exceeds int32 signs"
    return LdpcStructs(K=K, q=q, layer_edges=tuple(layer_edges),
                       max_dc=max_dc)


@functools.lru_cache(maxsize=None)
def _encode_gather(rate: str):
    """(NmK, max_d) var indices per check (pad -> index K, a zero column),
    in GLOBAL check order c = r + q*t."""
    s = build_structs(rate)
    t: LdpcTable = get_table(rate)
    q, NmK, K = s.q, s.NmK, s.K
    max_d = s.max_dc - 2
    idx = np.full((NmK, max_d), K, dtype=np.int32)
    ts = np.arange(GROUP)
    for r in range(q):
        c = r + q * ts                                    # checks of layer r
        for e, (g, sh) in enumerate(s.layer_edges[r]):
            idx[c, e] = g * GROUP + ((ts - sh) % GROUP)
    return idx


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _gather_groups(x: jnp.ndarray, order: jnp.ndarray, K: int) -> jnp.ndarray:
    """out[:, g*360:(g+1)*360] = x[:, order[g]*360:...] on the info part;
    the parity tail passes through unchanged."""
    F = x.shape[0]
    sys = x[:, :K].reshape(F, K // 360, 360)[:, order].reshape(F, K)
    return jnp.concatenate([sys, x[:, K:]], axis=-1)


def encode(bits: jnp.ndarray, rate: str,
           group_perm: jnp.ndarray = None) -> jnp.ndarray:
    """(F, K) info bits -> (F, N) codeword (IRA accumulator parity).

    ``group_perm`` (int (G,) array, may be traced): encode with the rate's
    base table under a UEP row-placement permutation sigma (new group g uses
    base row sigma[g], data/ldpc_tables.placement_order) WITHOUT baking a
    new table into the program — pure data movement around the fixed
    encoder, so placement scans reuse one compiled step.
    """
    if group_perm is not None:
        perm = jnp.asarray(group_perm, jnp.int32)
        # base-row j must see the group g with sigma[g] == j: gather inverse
        v = _gather_groups(bits, jnp.argsort(perm), bits.shape[1])
        cw = encode(v, rate)
        return jnp.concatenate([bits, cw[:, bits.shape[1]:]], axis=-1)
    s = build_structs(rate)
    # pre-parity: XOR of info bits feeding each check, gathered statically
    # (checks already in global order; pad index K hits the zero column)
    padded = jnp.pad(bits.astype(jnp.int32), ((0, 0), (0, 1)))
    pre = jnp.sum(padded[:, jnp.asarray(_encode_gather(rate))], axis=-1) % 2
    # accumulator: p_c = XOR_{c' <= c} pre_{c'} == cumsum mod 2 (log-depth scan)
    parity = jnp.cumsum(pre, axis=-1) % 2
    return jnp.concatenate([bits, parity.astype(bits.dtype)], axis=-1)


def syndrome_weight(cw: jnp.ndarray, rate: str) -> jnp.ndarray:
    """(F, N) codeword -> (F,) number of unsatisfied checks (0 == valid)."""
    s = build_structs(rate)
    info = jnp.pad(cw[:, :s.K].astype(jnp.int32), ((0, 0), (0, 1)))
    par = cw[:, s.K:].astype(jnp.int32)
    acc = info[:, jnp.asarray(_encode_gather(rate))].sum(-1)    # (F, NmK)
    prev = jnp.pad(par[:, :-1], ((0, 0), (1, 0)))
    return jnp.sum((acc + par + prev) % 2, axis=-1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BIG = 1e9          # absorbing LLR for the missing p_{-1} edge of check 0
_PHI_MIN = 1e-9
_PHI_MAX = 30.0


def _phi(x):
    """phi(x) = -log(tanh(x/2)), its own inverse; clipped for f32 stability."""
    x = jnp.clip(x, _PHI_MIN, _PHI_MAX)
    return -jnp.log(jnp.tanh(0.5 * x))


def _posterior_syndrome_unsat(L_info, L_par, s: LdpcStructs) -> jnp.ndarray:
    """True iff any check is unsatisfied by the CURRENT posteriors.

    Exact end-of-iteration syndrome on the hard decision, matching aff3ct's
    ``check_syndrome_soft()`` called after each full layered sweep.  A
    mid-sweep per-layer accumulation is NOT equivalent: later layers keep
    moving shared variables' posteriors, and with unnormalized MS the
    decoder measurably exited early on non-codewords (round-2 bug fix,
    regression-tested in tests/test_ldpc.py)."""
    q = s.q
    unsat = None
    for r in range(q):
        par = L_par[r] < 0
        for (g, sh) in s.layer_edges[r]:
            par = jnp.logical_xor(par, jnp.roll(L_info[g], sh, axis=0) < 0)
        if r > 0:
            prev_in = L_par[r - 1]
        else:
            prev_in = jnp.roll(L_par[q - 1], 1, axis=0).at[0].set(_BIG)
        par = jnp.logical_xor(par, prev_in < 0)
        u = jnp.any(par)
        unsat = u if unsat is None else (unsat | u)
    return unsat


def _check_update(Lq: jnp.ndarray, implem: str, alpha: float):
    """(dc, 360, F) extrinsic inputs -> (dc, 360, F) new check->var messages."""
    sign = jnp.where(Lq < 0, -1.0, 1.0).astype(jnp.float32)
    mag_in = jnp.abs(Lq)
    sign_out = jnp.prod(sign, axis=0, keepdims=True) * sign
    if implem == "SPA":
        phi = _phi(mag_in)
        tot = jnp.sum(phi, axis=0, keepdims=True)
        mag = _phi(tot - phi)
    else:
        m1 = jnp.min(mag_in, axis=0, keepdims=True)
        m2 = jnp.min(jnp.where(mag_in == m1, jnp.inf, mag_in), axis=0,
                     keepdims=True)
        is_min = (mag_in == m1) & (jnp.cumsum(
            (mag_in == m1).astype(jnp.int32), axis=0) == 1)
        mag = jnp.where(is_min, m2, m1)
        if implem == "NMS":
            mag = jnp.float32(alpha) * mag
    return sign_out * mag


def decode(llr: jnp.ndarray, rate: str, n_ite: int = 10, implem: str = "NMS",
           norm_factor: float = 0.875, use_pallas: str = "auto",
           syndrome_exit: bool = True,
           group_perm: jnp.ndarray = None) -> jnp.ndarray:
    """(F, N) channel LLRs (positive => bit 0) -> (F, N) posterior LLRs.

    Grouped-layered BP with roll-only layer updates; ``implem`` in
    {SPA, MS, NMS} mirroring the reference's --dec-implem (DVBS2.cpp:88).
    ``syndrome_exit`` stops iterating once every check's sign parity is
    satisfied (aff3ct's default-on syndrome check; its --dec-no-synd turns
    the equivalent off). On TPU the (N)MS path dispatches to the
    VMEM-resident Pallas kernel (ops/ldpc_pallas.py, ~5x the XLA version);
    ``use_pallas`` in {"auto", "never", "always"}.

    ``group_perm``: decode the base table under a (possibly traced) UEP
    row-placement permutation — see ``encode``.
    """
    if group_perm is not None:
        perm = jnp.asarray(group_perm, jnp.int32)
        K = build_structs(rate).K
        llr2 = _gather_groups(llr, jnp.argsort(perm), K)
        post = decode(llr2, rate, n_ite=n_ite, implem=implem,
                      norm_factor=norm_factor, use_pallas=use_pallas,
                      syndrome_exit=syndrome_exit)
        return _gather_groups(post, perm, K)
    if use_pallas != "never":
        on_tpu = jax.default_backend() not in ("cpu",)
        if use_pallas == "always" or on_tpu:
            from dvbs2_tpu.ops import ldpc_pallas
            if implem in ("MS", "NMS"):
                alpha = norm_factor if implem == "NMS" else 1.0
                return ldpc_pallas.decode_nms(llr, rate, n_ite=n_ite,
                                              norm_factor=alpha,
                                              syndrome_exit=syndrome_exit)
            if implem == "SPA":
                return ldpc_pallas.decode_spa(llr, rate, n_ite=n_ite,
                                              syndrome_exit=syndrome_exit)
    s = build_structs(rate)
    F, N = llr.shape
    assert N == N_LDPC
    G, q = s.n_groups, s.q

    lt = llr.T.astype(jnp.float32)                       # (N, F)
    L_info0 = lt[:s.K].reshape(G, GROUP, F)
    # parity plane [r, t] = LLR of p_{r + q t}
    L_par0 = lt[s.K:].reshape(GROUP, q, F).transpose(1, 0, 2)

    # Carry per-group/per-layer blocks as SEPARATE pytree leaves: updating a
    # group rebinds one (360, F) leaf instead of a dynamic-update-slice into
    # one big array (which XLA materializes as a full copy per update —
    # measured ~6x slowdown).
    L_info0 = tuple(L_info0[g] for g in range(G))
    L_par0 = tuple(L_par0[r] for r in range(q))

    if implem in ("MS", "NMS"):
        alpha = norm_factor if implem == "NMS" else 1.0
        return _decode_minsum_compressed(lt, L_info0, L_par0, s, n_ite,
                                         alpha, F, syndrome_exit)

    # derive the zero message state from the input so its sharding/varying
    # type matches under shard_map (a plain jnp.zeros is unvarying and the
    # fori_loop carry would change type on the first iteration)
    zf = 0.0 * lt[0, 0]
    R0 = tuple(jnp.zeros((s.dc_r(r), GROUP, F), jnp.float32) + zf
               for r in range(q))

    def one_layer(r, L_info, L_par, R):
        edges = s.layer_edges[r]
        d_r = len(edges)
        L_info = list(L_info)
        L_par = list(L_par)
        R = list(R)
        Lq = [jnp.roll(L_info[g], sh, axis=0) - R[r][e]
              for e, (g, sh) in enumerate(edges)]
        Lq.append(L_par[r] - R[r][d_r])                  # p_self
        if r > 0:
            prev_in = L_par[r - 1]
        else:
            prev_in = jnp.roll(L_par[q - 1], 1, axis=0).at[0].set(_BIG)
        Lq.append(prev_in - R[r][d_r + 1])               # p_prev
        Lq = jnp.stack(Lq)                               # (dc_r, 360, F)

        Rnew = _check_update(Lq, implem, norm_factor)
        # DELTA write-back (L += roll^-1(R_new - R_old)): equivalent to the
        # posterior overwrite when a group meets the layer once, and correct
        # accumulation when a table row repeats a residue (genuine EN 302 307
        # rows do)
        delta = Rnew - R[r]
        for e, (g, sh) in enumerate(edges):
            L_info[g] = L_info[g] + jnp.roll(delta[e], -sh, axis=0)
        L_par[r] = L_par[r] + delta[d_r]
        if r > 0:
            L_par[r - 1] = L_par[r - 1] + delta[d_r + 1]
        else:
            # row 359 of the rolled-back block is the dummy head edge of
            # check 0 (p_{-1} doesn't exist): contributes nothing
            back = jnp.roll(delta[d_r + 1], -1, axis=0)
            L_par[q - 1] = L_par[q - 1] + back.at[GROUP - 1].set(0.0)
        R[r] = Rnew
        return tuple(L_info), tuple(L_par), tuple(R)

    def one_iteration(carry):
        i, done, L_info, L_par, R = carry
        for r in range(q):
            L_info, L_par, R = one_layer(r, L_info, L_par, R)
        if syndrome_exit:
            done = ~_posterior_syndrome_unsat(L_info, L_par, s)
        return (i + 1, done, L_info, L_par, R)

    def cond(carry):
        i, done, *_ = carry
        keep = i < n_ite
        if syndrome_exit:
            keep = keep & ~done
        return keep

    # done0 derives from the data so its varying type under shard_map matches
    # the loop-updated value (cf. the zf trick above)
    _, _, L_info, L_par, _ = jax.lax.while_loop(
        cond, one_iteration,
        (jnp.int32(0), zf > 0.5, L_info0, L_par0, R0))
    out_info = jnp.concatenate(L_info, axis=0).reshape(s.K, F)
    out_par = jnp.stack(L_par).transpose(1, 0, 2).reshape(s.NmK, F)
    return jnp.concatenate([out_info, out_par], axis=0).T


def _decode_minsum_compressed(lt, L_info0, L_par0, s: LdpcStructs,
                              n_ite: int, alpha: float, F: int,
                              syndrome_exit: bool = True):
    """(N)MS layered decode with COMPRESSED per-check state.

    Instead of the full (q, dc, 360, F) message tensor, each check keeps
    (min1, min2, argmin, packed signs) — the standard hardware trick — which
    cuts the carried state (and its HBM traffic per layer) by ~dc/4x. The
    stored sign bit e IS the sign of the outgoing message R_e, so
    R_e = alpha * (1 - 2*bit_e) * (e == argmin ? min2 : min1).
    """
    G, q = s.n_groups, s.q
    a = jnp.float32(alpha)

    zf = 0.0 * lt[0, 0]
    zi = jnp.int32(0) * lt[0, 0].astype(jnp.int32)
    m1_0 = tuple(jnp.zeros((GROUP, F), jnp.float32) + zf for _ in range(q))
    m2_0 = m1_0
    am_0 = tuple(jnp.zeros((GROUP, F), jnp.int32) + zi for _ in range(q))
    sg_0 = am_0

    def reconstruct(e, m1, m2, am, sg):
        sign = 1.0 - 2.0 * ((sg >> e) & 1).astype(jnp.float32)
        mag = jnp.where(am == e, m2, m1)
        return a * sign * mag

    def one_layer(r, L_info, L_par, m1, m2, am, sg):
        edges = s.layer_edges[r]
        d_r = len(edges)
        dc = d_r + 2
        L_info, L_par = list(L_info), list(L_par)
        m1, m2, am, sg = list(m1), list(m2), list(am), list(sg)
        m1r, m2r, amr, sgr = m1[r], m2[r], am[r], sg[r]
        Lq = [jnp.roll(L_info[g], sh, axis=0)
              - reconstruct(e, m1r, m2r, amr, sgr)
              for e, (g, sh) in enumerate(edges)]
        Lq.append(L_par[r] - reconstruct(d_r, m1r, m2r, amr, sgr))
        if r > 0:
            prev_in = L_par[r - 1]
        else:
            prev_in = jnp.roll(L_par[q - 1], 1, axis=0).at[0].set(_BIG)
        Lq.append(prev_in - reconstruct(d_r + 1, m1r, m2r, amr, sgr))
        Lq = jnp.stack(Lq)                                # (dc_r, 360, F)

        mag_in = jnp.abs(Lq)
        nm1 = jnp.min(mag_in, axis=0)
        nm2 = jnp.min(jnp.where(mag_in == nm1, jnp.inf, mag_in), axis=0)
        nm2 = jnp.where(jnp.isinf(nm2), nm1, nm2)   # all-tied degenerate case
        first_min = (mag_in == nm1) & (jnp.cumsum(
            (mag_in == nm1).astype(jnp.int32), axis=0) == 1)
        nam = jnp.argmax(first_min, axis=0).astype(jnp.int32)
        neg = (Lq < 0)
        sp = (jnp.sum(neg.astype(jnp.int32), axis=0) % 2).astype(bool)
        # outgoing sign bit e = sp XOR neg_e
        nsg = jnp.zeros_like(sgr)
        for e in range(dc):
            bit = jnp.bitwise_xor(sp, neg[e]).astype(jnp.int32)
            nsg = nsg | (bit << e)

        def rnew(e):
            sign = 1.0 - 2.0 * jnp.bitwise_xor(sp, neg[e]).astype(jnp.float32)
            mag = jnp.where(nam == e, nm2, nm1)
            return a * sign * mag

        # DELTA write-back (see the full-R path): correct when a table row
        # repeats a residue so a group meets the layer more than once
        for e, (g, sh) in enumerate(edges):
            delta = rnew(e) - reconstruct(e, m1r, m2r, amr, sgr)
            L_info[g] = L_info[g] + jnp.roll(delta, -sh, axis=0)
        L_par[r] = L_par[r] + (rnew(d_r)
                               - reconstruct(d_r, m1r, m2r, amr, sgr))
        d_prev = rnew(d_r + 1) - reconstruct(d_r + 1, m1r, m2r, amr, sgr)
        if r > 0:
            L_par[r - 1] = L_par[r - 1] + d_prev
        else:
            back = jnp.roll(d_prev, -1, axis=0)
            L_par[q - 1] = L_par[q - 1] + back.at[GROUP - 1].set(0.0)
        m1[r], m2[r], am[r], sg[r] = nm1, nm2, nam, nsg
        return (tuple(L_info), tuple(L_par), tuple(m1), tuple(m2),
                tuple(am), tuple(sg))

    def one_iteration(carry):
        i, done, L_info, L_par, m1, m2, am, sg = carry
        for r in range(q):
            L_info, L_par, m1, m2, am, sg = one_layer(
                r, L_info, L_par, m1, m2, am, sg)
        if syndrome_exit:
            done = ~_posterior_syndrome_unsat(L_info, L_par, s)
        return (i + 1, done, L_info, L_par, m1, m2, am, sg)

    def cond(carry):
        i, done, *_ = carry
        keep = i < n_ite
        if syndrome_exit:
            keep = keep & ~done
        return keep

    _, _, L_info, L_par, *_ = jax.lax.while_loop(
        cond, one_iteration,
        (jnp.int32(0), zf > 0.5, L_info0, L_par0, m1_0, m2_0, am_0, sg_0))
    out_info = jnp.concatenate(L_info, axis=0).reshape(s.K, F)
    out_par = jnp.stack(L_par).transpose(1, 0, 2).reshape(s.NmK, F)
    return jnp.concatenate([out_info, out_par], axis=0).T


def hard_decision(post_llr: jnp.ndarray) -> jnp.ndarray:
    """aff3ct convention: bit = 1 iff LLR < 0."""
    return (post_llr < 0).astype(jnp.int8)
