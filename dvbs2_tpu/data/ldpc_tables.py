"""DVB-S2 short-frame (N=16200) LDPC parity-address tables.

The reference application configures aff3ct's ``LDPC_DVBS2`` encoder /
``BP_HORIZONTAL_LAYERED`` decoder (reference: src/common/Factory/DVBS2/
DVBS2.cpp:418-449); the actual EN 302 307 Annex C address tables live in the
``lib/aff3ct`` submodule, which is EMPTY in the mounted snapshot, and this
build environment has no network egress — so the standard's exact tables are
not recoverable here.

**Data provenance (IMPORTANT):** the tables are a deterministic reconstruction
of the same code *ensemble* as the standard's codes — identical frame size,
rate, quasi-cyclic lifting (group size 360, accumulator parity, addresses of
the form ``(a + m*q) mod (N-K)``), identical variable-degree profile, uniform
check degree — NOT bit-compatible with EN 302 307 Annex C.  Two generations
exist:

* ``v2s<seed>`` (default): greedy PEG-style, girth>=6, ACE-weighted 6-cycle
  minimization (data/ldpc_construct.py).  The DEFAULT_VARIANT per rate is the
  candidate whose measured SPA-50 FER through the full BB chain lands on the
  reference's refs/TX_RX_BB curves within Monte-Carlo noise — selected and
  reproducible via tools/parity_sweep.py (results in parity_spa50.json).
* ``r1``: round-1 sampler (balanced residues + distinct pairwise address
  differences), kept for comparison.

A specific candidate is addressed by suffixing the rate string:
``get_table("8/9@v2s3")``.  Swapping in the genuine Annex C tables remains a
data-only change (subject to the roll-path residue-distinctness note in
ops/ldpc.py).

Code geometry per rate (short FECFRAME, N=16200):
  3/5 : K=9720,  q=18, 27 groups (9 of degree 12, 18 of degree 3), dc=11
  8/9 : K=14400, q=5,  40 groups (5 of degree 4, 35 of degree 3),  dc=27
"""
from __future__ import annotations

import dataclasses
import re

import numpy as np

N_LDPC = 16200
GROUP = 360


@dataclasses.dataclass(frozen=True)
class LdpcTable:
    rate: str
    K: int
    q: int
    rows: tuple          # tuple of tuples of parity addresses, one row per 360-group
    source: str          # 'EN302307-AnnexC' or 'ensemble-reconstruction'

    @property
    def NmK(self) -> int:
        return N_LDPC - self.K

    @property
    def n_groups(self) -> int:
        return self.K // GROUP

    @property
    def n_info_edges(self) -> int:
        return sum(len(r) for r in self.rows) * GROUP


def _generate_ensemble_table(K: int, q: int, degrees: list, seed: int) -> tuple:
    """Deterministic same-ensemble table: balanced residues mod q (uniform
    check degree) and distinct pairwise address differences (no 4-cycles in
    the lifted info-info subgraph)."""
    NmK = N_LDPC - K
    per_class = sum(degrees) // q
    assert sum(degrees) % q == 0, "degree profile must balance residues"
    rng = np.random.RandomState(seed)
    quota = np.full(q, per_class, dtype=np.int64)
    used_diffs: set = set()
    rows = []

    # Residue classes are assigned round-robin: distinct within each row
    # (so each 360-group meets each decoder layer at most once — layer
    # updates then lower to pure cyclic rolls, see ops/ldpc.py) and exactly
    # balanced overall (uniform check degree).
    offset = 0
    residues_per_row = []
    for d in degrees:
        residues_per_row.append([(offset + j) % q for j in range(d)])
        quota[[(offset + j) % q for j in range(d)]] -= 1
        offset += d
    assert np.all(quota == 0)

    def sample_row(res):
        addrs = [int(c + q * rng.randint(0, NmK // q)) for c in res]
        diffs, clashes = set(), 0
        for i in range(len(addrs)):
            for j in range(i + 1, len(addrs)):
                dd = (addrs[i] - addrs[j]) % NmK
                for v in (dd, (-dd) % NmK):
                    if v in used_diffs or v in diffs:
                        clashes += 1
                    diffs.add(v)
        return addrs, diffs, clashes

    for res in residues_per_row:
        best = None
        for _attempt in range(400):
            cand = sample_row(res)
            if best is None or cand[2] < best[2]:
                best = cand
            if best[2] == 0:
                break
        addrs, diffs, _ = best
        used_diffs |= diffs
        rows.append(tuple(sorted(addrs)))
    return tuple(rows)


def _degrees_3_5() -> list:
    return [12] * 9 + [3] * 18


def _degrees_8_9() -> list:
    return [4] * 5 + [3] * 35


_CACHE: dict = {}

_GEOM = {"3/5": (9720, 18, _degrees_3_5), "8/9": (14400, 5, _degrees_8_9)}

# Alternative variable-degree profiles for the v4 sub-ensemble.  The
# baseline profile ('a') came from the uniform-check-degree assumption; the
# genuine Annex C profile is unknown offline, and the measured 8PSK gap
# with every QPSK-parity candidate (see ldpc_place_*.json: placement moves
# FER < ~20%) leaves the degree profile as the one code axis QPSK parity
# does not pin — two codes equal on the uniform channel can split under the
# column-interleaver's shaped bit reliabilities (tools/profile_scan.py).
PROFILES = {
    "3/5": {
        "a": [12] * 9 + [3] * 18,            # baseline (== v3 profile)
        "b": [12] * 12 + [3] * 15,
        "c": [12] * 6 + [3] * 21,
        "d": [13] * 9 + [3] * 18,
        "e": [6] * 27,
        "f": [12] * 9 + [4] * 9 + [3] * 9,
        "g": [11] * 9 + [3] * 18,
        "h": [12] * 5 + [4] * 22,
    },
    "8/9": {
        "a": [4] * 5 + [3] * 35,             # baseline
        "b": [4] * 10 + [3] * 30,
        "c": [4] * 2 + [3] * 38,
        "d": [5] * 5 + [3] * 35,
    },
}

# Frozen winners of the SPA-50 selection sweeps, chosen JOINTLY across the
# MODCODs sharing each rate (QPSK parity within MC noise is achieved; under
# 8PSK the column interleaver weights codeword spans by constellation-bit
# reliability and every reconstruction candidate measures a residual FER
# gap at the steepest ref point — see ldpc_joint_*.json / ldpc_uep_*.json
# scans, ldpc_scan_* selection history, and parity_spa50.json for the
# frozen defaults' full 5-MODCOD record).
DEFAULT_VARIANT = {"3/5": "v3s2", "8/9": "v2s1"}


def _permute_rows(rows: tuple, degrees: list, spec: str) -> tuple:
    """Reassign table rows to group POSITIONS — the UEP placement knob.

    Under QPSK this is a pure coordinate permutation of the same code
    (identical FER); under 8PSK/16APSK the column interleaver maps group
    positions to constellation bit positions of unequal reliability
    (DVBS2.cpp:451-476 + the Gray structure of conf/mod/8PSK.mod), so WHERE
    the high-degree groups sit changes the measured waterfall.  The genuine
    Annex C tables embed one specific placement; this knob lets the
    selection scans search that axis while keeping the (QPSK-verified)
    underlying graph fixed.

    Spec (position of the high-degree groups): F = first (identity),
    L = last, M = middle, E = evenly spread, S<k> = seeded random positions
    for high-degree groups (low keep order), R<k> = seeded permutation of
    ALL rows.
    """
    return tuple(rows[g] for g in placement_order(len(rows), degrees, spec))


def placement_order(G: int, degrees: list, spec: str) -> list:
    """The permutation sigma for a placement spec: new group position i
    holds base row sigma[i].  Also consumed (as a traced gather) by
    ops/ldpc.py's group_perm fast path, which lets the UEP placement scans
    reuse ONE compiled program across hundreds of placements."""
    hi = [g for g in range(G) if degrees[g] > min(degrees)]
    lo = [g for g in range(G) if degrees[g] <= min(degrees)]
    if spec == "F":
        order = list(range(G))
    elif spec == "L":
        order = lo + hi
    elif spec == "M":
        pad = (G - len(hi)) // 2
        order = lo[:pad] + hi + lo[pad:]
    elif spec == "E":
        stride = G / len(hi)
        pos = {int(i * stride) for i in range(len(hi))}
        order, hit, lot = [], iter(hi), iter(lo)
        for i in range(G):
            order.append(next(hit) if i in pos else next(lot))
    elif spec.startswith("S"):
        rng = np.random.RandomState(int(spec[1:]))
        pos = set(rng.choice(G, size=len(hi), replace=False).tolist())
        order, hit, lot = [], iter(hi), iter(lo)
        for i in range(G):
            order.append(next(hit) if i in pos else next(lot))
    elif spec.startswith("R"):
        rng = np.random.RandomState(int(spec[1:]))
        order = rng.permutation(G).tolist()
    else:
        raise ValueError(f"unknown UEP placement spec {spec!r}")
    return order


def get_table(rate: str) -> LdpcTable:
    """Address table for '3/5' or '8/9'; optional '@<variant>' suffix selects
    a specific construction (e.g. '8/9@v2s3', '3/5@r1'); a '-p<spec>'
    variant suffix applies a UEP row-placement permutation
    (e.g. '8/9@v2s1-pL')."""
    if rate in _CACHE:
        return _CACHE[rate]
    base, _, variant = rate.partition("@")
    if base not in _GEOM:
        raise ValueError(f"unsupported LDPC rate {rate!r}")
    K, q, degrees_fn = _GEOM[base]
    variant = variant or DEFAULT_VARIANT[base]
    variant, _, perm_spec = variant.partition("-p")
    degrees_used = degrees_fn()
    if variant.startswith("rc"):
        # best-effort RECALLED Annex C candidate (round-5 experiment;
        # LOW confidence, hybrid fill — see data/ldpc_annexc_recall.py)
        from dvbs2_tpu.data.ldpc_annexc_recall import recalled_rows_3_5
        if base != "3/5":
            raise ValueError(
                "no credible Annex C recall exists for rate 8/9 "
                "(ldpc_annexc_recall.py documents the negative result)")
        rows = recalled_rows_3_5(variant)
        source = f"EN302307-AnnexC-recalled-lowconf-{variant}"
    elif variant == "r1":
        seed = {"3/5": 0x35, "8/9": 0x89}[base]
        rows = _generate_ensemble_table(K, q, degrees_fn(), seed=seed)
        source = "ensemble-reconstruction-r1"
    elif variant.startswith("v2s"):
        # 'v2s<seed>[w<pct>][c<pct>]': seed, 6-cycle penalty scale (default
        # 100), residue cluster fraction (default 0) — see ldpc_construct
        from dvbs2_tpu.data.ldpc_construct import construct_table
        m = re.fullmatch(r"v2s(\d+)(?:w(\d+))?(?:c(\d+))?", variant)
        if not m:
            raise ValueError(f"bad LDPC table variant {variant!r}")
        w6 = float(m.group(2)) / 100.0 if m.group(2) else 1.0
        cf = float(m.group(3)) / 100.0 if m.group(3) else 0.0
        rows = construct_table(K, q, degrees_fn(), seed=int(m.group(1)),
                               w6=w6, cluster_frac=cf)
        source = f"ensemble-peg-{variant}"
    elif variant.startswith("v4"):
        # 'v4<profile><seed>': v3 iid generator with an alternative
        # variable-degree profile from PROFILES (tools/profile_scan.py)
        from dvbs2_tpu.data.ldpc_construct import construct_table_v3
        m = re.fullmatch(r"v4([a-z])s(\d+)", variant)
        if not m:
            raise ValueError(f"bad LDPC table variant {variant!r}")
        degrees_used = PROFILES[base][m.group(1)]
        assert len(degrees_used) == K // GROUP
        rows = construct_table_v3(K, q, degrees_used, seed=int(m.group(2)))
        source = f"ensemble-iid-{variant}"
    elif variant.startswith("v3s"):
        # 'v3s<seed>[f<pct>]': standard-like iid residues (rows repeat
        # residues mod q, layer degrees vary); f<pct> = fraction of rows
        # sampled iid (collision density) — ldpc_construct.construct_table_v3
        from dvbs2_tpu.data.ldpc_construct import construct_table_v3
        m = re.fullmatch(r"v3s(\d+)(?:f(\d+))?", variant)
        if not m:
            raise ValueError(f"bad LDPC table variant {variant!r}")
        frac = float(m.group(2)) / 100.0 if m.group(2) else 1.0
        rows = construct_table_v3(K, q, degrees_fn(), seed=int(m.group(1)),
                                  iid_frac=frac)
        source = f"ensemble-iid-{variant}"
    else:
        raise ValueError(f"unknown LDPC table variant {variant!r}")
    if perm_spec:
        rows = _permute_rows(rows, degrees_used, perm_spec)
        source += f"-p{perm_spec}"
    t = LdpcTable(base, K=K, q=q, rows=rows, source=source)
    validate_table(t)
    _CACHE[rate] = t
    return t


def validate_table(t: LdpcTable) -> None:
    """Structural invariants any valid DVB-S2-style short-frame table obeys."""
    NmK = t.NmK
    assert t.K % GROUP == 0 and t.n_groups == len(t.rows)
    assert NmK == t.q * GROUP
    flat = [a for r in t.rows for a in r]
    assert all(0 <= a < NmK for a in flat), "addresses out of range"
    for r in t.rows:
        assert len(set(r)) == len(r), "duplicate address within a group"
    counts = np.bincount(np.asarray(flat) % t.q, minlength=t.q)
    # packed int32 sign words in the min-sum decoders: dc <= 30
    assert counts.max() + 2 <= 30, "layer degree exceeds sign-word capacity"
    if "peg" in t.source or "r1" in t.source:
        # the v1/v2 sub-ensembles keep residue classes exactly balanced
        # (uniform check degree); the iid v3 ensemble does not
        assert counts.min() == counts.max(), "unbalanced residue classes"
