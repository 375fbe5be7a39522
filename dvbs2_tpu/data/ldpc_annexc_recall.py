"""Best-effort RECALLED EN 302 307 Annex C candidate tables (round-5
VERDICT item 1): the one falsifiable experiment left on the sole
remaining parity violation.

PROVENANCE AND CONFIDENCE (read before using):

These rows are written from memory of the public DVB-S2 standard's
short-frame (N=16200) parity address tables / their copies in public SDR
code.  They are NOT transcribed from any file in this environment (the
snapshot provably contains no Annex C data: `lib/aff3ct` submodule empty,
`conf/` has only .mod/.src files, no network egress).  Confidence is LOW
and measurably so:

* rate 3/5 (K=9720, q=18, addresses < 6480): nine degree-12 rows and
  three degree-3 fragments are recalled; **three recalled addresses are
  out of range (6546, 6483, 6741 >= 6480), proving digit corruption** in
  the recollection.  Two correction hypotheses are offered as candidates
  rc1 (digit transposition: 6546->6456, 6483->6438, 6741->6471) and rc2
  (spurious trailing digit: ->654, ->648, ->674).  The 15 unrecalled
  degree-3 rows are filled from the frozen v3s2 reconstruction, making
  every candidate a HYBRID — even a perfect recall of the degree-12 part
  cannot reproduce the genuine code exactly.
* rate 8/9 (K=14400, q=5, addresses < 1800): **no credible recall
  exists.**  The only fragments retrievable ({6235,2848,3222},
  {5800,3492,5348}, ...) are provably from a different table (addresses
  up to ~7000 exceed N-K=1800; they fit a normal-frame geometry), i.e.
  misattributed memory.  No candidate is emitted for 8/9; the experiment
  record (ANNEXC_RECALL.md) documents this negative result.

The accept/reject harness makes wrong recall safe: a candidate must
simultaneously (a) round-trip encode/decode, (b) hold QPSK BB parity at
both rates' refs, and (c) collapse the measured 8PSK z-scores — and the
validated DE predictor (tools/pexit_predict.py) pre-screens (b)/(c)
offline: the genuine-table signature is a ~0.05-0.08 dB better 8PSK
threshold at equal QPSK threshold vs the frozen reconstruction
(DE_ANALYSIS.md).  Candidates failing the screen are rejected without
touching the frozen defaults.

Reference config evidence for what these tables feed:
src/common/Factory/DVBS2/DVBS2.cpp:427-432 (LDPC_DVBS2 encoder, N=16200).
"""
from __future__ import annotations

# Rows as recalled; entries marked CORRUPT are >= 6480 and get corrected
# per-candidate below.  Order: nine degree-12 rows, then the three
# recalled degree-3 fragments (table positions 10-12).
_RECALLED_3_5_DEG12 = [
    [2765, 5713, 6426, 3596, 1374, 4811, 2182, 544, 3394, 2840, 4310, 771],
    [4951, 211, 2208, 723, 1740, 1803, 5217, 2331, 6348, 3839, 1234, 6246],
    [2099, 5500, 6546, 5100, 5462, 4421, 4932, 2388, 5453, 4757, 3461, 3048],  # 6546 CORRUPT
    [2626, 4520, 4163, 6115, 5368, 3110, 4918, 1082, 4494, 3687, 6157, 4105],
    [4370, 2911, 876, 2952, 3544, 4678, 3195, 2162, 6294, 4548, 2855, 4691],
    [1480, 1207, 6448, 2731, 4375, 3222, 1290, 3524, 2527, 67, 4628, 4926],
    [1690, 921, 597, 3095, 5735, 3460, 2216, 6353, 4809, 4756, 3457, 575],
    [2014, 5951, 5907, 4967, 4689, 2509, 4212, 3856, 4229, 5281, 1248, 3181],
    [4772, 2990, 202, 2755, 5426, 5466, 6483, 3894, 6372, 4935, 2695, 5567],  # 6483 CORRUPT
]

_RECALLED_3_5_DEG3 = [
    [4788, 4140, 6232],
    [4130, 5835, 6252],
    [5339, 6741, 5553],   # 6741 CORRUPT
]

# correction hypotheses for the three provably-corrupted addresses
_CORRECTIONS = {
    "rc1": {6546: 6456, 6483: 6438, 6741: 6471},   # digit transposition
    "rc2": {6546: 654, 6483: 648, 6741: 674},      # spurious last digit
}


def recalled_rows_3_5(candidate: str) -> tuple:
    """27 rows for a '3/5@rc*' candidate: recalled degree-12 rows +
    recalled degree-3 fragments (corrected per the candidate's
    hypothesis), with the 15 unrecalled degree-3 rows taken from the
    frozen v3s2 reconstruction (hybrid — see module docstring)."""
    from dvbs2_tpu.data.ldpc_tables import get_table
    fix = _CORRECTIONS[candidate]
    rows = [tuple(fix.get(a, a) for a in r)
            for r in _RECALLED_3_5_DEG12 + _RECALLED_3_5_DEG3]
    frozen = get_table("3/5@v3s2").rows
    rows += [tuple(r) for r in frozen[12:27]]
    assert len(rows) == 27
    return tuple(rows)
