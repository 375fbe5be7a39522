"""Regression pins for the strobed-extraction scatter (ops/sync.py
extract_strobed).

Round-4 pitfall being pinned: passing indices_are_sorted/unique_indices
hints to the `.at[].set(mode="drop")` scatter silently MIS-SCATTERS on
the TPU lowering for some strobe patterns (the dump index cap+N is
interleaved between the increasing slots and repeated, so neither hint
property holds; measured round 4 as NaN-poisoned acquisition correlators
for ~2/64 streams at B=64).  CPU CI cannot reproduce the TPU
mis-lowering, so this pins the invariant two ways:

1. behaviorally — extract_strobed against a pure-numpy oracle on
   adversarial strobe patterns (bursts, all-ones, all-zeros, slips at
   block boundaries), so any algorithmic regression is caught on every
   backend; and
2. structurally — the scatter call sites in ops/sync.py must not carry
   the hint kwargs, so the pitfall cannot be silently reintroduced and
   only found on hardware.
"""
import inspect
import re

import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.ops import sync


def _oracle(y, strobe, n_out, buf, count):
    """Reference semantics (Synchronizer_timing.hxx:262-304): append
    strobed samples to the carry, emit n_out when available (else
    underflow: emit nothing, keep accumulating)."""
    B, N, _ = y.shape
    cap = buf.shape[1]
    out = np.zeros((B, n_out, 2), np.float32)
    nbuf = np.zeros_like(buf)
    ncount = np.zeros_like(count)
    under = np.zeros((B,), bool)
    for b in range(B):
        acc = list(buf[b, :count[b]])
        for t in range(N):
            if strobe[b, t]:
                acc.append(y[b, t])
        if len(acc) < n_out:
            under[b] = True
            keep = acc
        else:
            out[b] = np.asarray(acc[:n_out])
            keep = acc[n_out:]
        keep = keep[:cap]
        ncount[b] = len(keep)
        if keep:
            nbuf[b, :len(keep)] = np.asarray(keep)
    return out, nbuf, ncount, under


def test_extract_strobed_matches_oracle_adversarial_patterns():
    rng = np.random.RandomState(11)
    B, N, cap, n_out = 4, 64, 32, 24
    y = rng.randn(B, N, 2).astype(np.float32)
    # adversarial strobes per stream: all-ones, all-zeros (underflow),
    # dense random, and a burst that straddles the carry boundary
    strobe = np.zeros((B, N), np.int8)
    strobe[0] = 1
    strobe[1] = 0
    strobe[2] = rng.randint(0, 2, N)
    strobe[3, :8] = 1
    strobe[3, 40:64] = 1
    buf = np.zeros((B, cap, 2), np.float32)
    buf[:, :6] = rng.randn(B, 6, 2).astype(np.float32)
    count = np.array([6, 6, 6, 6], np.int32)

    st = sync.ExtractState(buf=jnp.asarray(buf), count=jnp.asarray(count))
    sym, st2, uf = sync.extract_strobed(jnp.asarray(y),
                                        jnp.asarray(strobe), n_out, st)
    o_sym, o_buf, o_count, o_uf = _oracle(y, strobe, n_out, buf, count)

    np.testing.assert_array_equal(np.asarray(uf), o_uf)
    np.testing.assert_array_equal(np.asarray(st2.count), o_count)
    for b in range(len(o_uf)):
        if not o_uf[b]:
            np.testing.assert_allclose(np.asarray(sym)[b], o_sym[b],
                                       err_msg=f"stream {b}")
        np.testing.assert_allclose(
            np.asarray(st2.buf)[b, :o_count[b]], o_buf[b, :o_count[b]],
            err_msg=f"carry of stream {b}")
    # chaining across two calls keeps the carry exact
    sym2, st3, uf2 = sync.extract_strobed(jnp.asarray(y),
                                          jnp.asarray(strobe), n_out, st2)
    o2 = _oracle(y, strobe, n_out, np.asarray(st2.buf),
                 np.asarray(st2.count))
    np.testing.assert_array_equal(np.asarray(uf2), o2[3])
    for b in range(len(o_uf)):
        if not o2[3][b]:
            np.testing.assert_allclose(np.asarray(sym2)[b], o2[0][b])


def test_no_scatter_hints_in_sync_source():
    """The TPU scatter mis-lowering tripwire: no .at[...] op in
    ops/sync.py may pass indices_are_sorted/unique_indices (see module
    docstring for the measured round-4 failure)."""
    src = inspect.getsource(sync)
    assert not re.search(r"indices_are_sorted\s*=", src), \
        "scatter hint reintroduced in ops/sync.py — see round-4 NaN pitfall"
    assert not re.search(r"unique_indices\s*=", src), \
        "scatter hint reintroduced in ops/sync.py — see round-4 NaN pitfall"


def test_realign_window_onehot_branch_matches_gather():
    """realign_window's large-batch one-hot-matmul block selection must be
    bit-exact vs the small-batch take_along branch and the direct index
    oracle (the matmul multiplies real f32 data by exact 0/1)."""
    rng = np.random.RandomState(7)
    L = 700
    for rows in (8, 300):     # crosses the B<=256 branch point
        ext = rng.randn(rows, 2 * L, 2).astype(np.float32)
        start = rng.randint(0, L + 1, rows).astype(np.int32)
        out = sync.realign_window(jnp.asarray(ext), jnp.asarray(start), L)
        oracle = np.stack([ext[b, start[b]:start[b] + L] for b in range(rows)])
        np.testing.assert_array_equal(np.asarray(out), oracle,
                                      err_msg=f"rows={rows}")
