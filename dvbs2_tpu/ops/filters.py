"""Filters and sample-stream impairments, TPU-native.

Equivalents of the reference's Filter/Multiplier module families
(SURVEY.md §2 rows 7-17):
  - RRC taps:          Filter_RRC_ccr_naive.cpp:14-48 (closed form, unit energy)
  - streaming FIR:     Filter_FIR_ccr (stateful history across calls)
  - UPRRC shaping:     Filter_UPFIR_ccr_naive.cpp:5-66 (polyphase upsampler)
  - Farrow frac delay: Filter_Farrow_ccr_naive.hxx:8-20 (piecewise parabolic)
  - integer delay:     Variable_delay_cc_naive.hxx:8-19
  - frame delay:       Filter_buffered_delay.cpp:24-38
  - NCO / CFO mixer:   Multiplier_sine_ccc_naive.cpp:14-120 (nu quantized to
                       1e-6, phase index wraps at 1e6 — phase-continuous)
  - AGC:               Multiplier_AGC_cc_naive.cpp:23-46
  - fading sequence:   Multiplier_fading_DVBS2.cpp:12-56

TPU-native design: everything here is feedforward, so a "stateful stream
filter" is a convolution over [carry | block] with the last taps-1 samples
carried between calls — XLA lowers the grouped conv to MXU/VPU ops; there is
no per-sample loop anywhere. Streams are (B, N, 2) split re/im arrays (B
parallel streams; for the sequential full-chain channel B=1 and N covers the
whole frame batch).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# taps
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def rrc_taps(rolloff: float = 0.2, osf: int = 2, grp_delay: int = 20) -> np.ndarray:
    """Root-raised-cosine taps, unit energy (2*grp_delay*osf + 1 taps).

    Matches the closed form of Filter_RRC_ccr_naive::compute_rrc_coefs.
    """
    n = grp_delay * osf
    taps = np.zeros(2 * n + 1)
    taps[n] = 1.0 - rolloff + 4.0 * rolloff / np.pi
    for i in range(1, n + 1):
        t = i / osf
        if abs(4.0 * rolloff * t - 1.0) < 1e-12 or abs(4.0 * rolloff * t + 1.0) < 1e-12:
            v = rolloff / np.sqrt(2.0) * (
                (1.0 + 2.0 / np.pi) * np.sin(np.pi / (4.0 * rolloff))
                + (1.0 - 2.0 / np.pi) * np.cos(np.pi / (4.0 * rolloff)))
        else:
            num = (np.sin(np.pi * t * (1.0 - rolloff))
                   + 4.0 * rolloff * t * np.cos(np.pi * t * (1.0 + rolloff)))
            den = np.pi * t * (1.0 - 16.0 * rolloff**2 * t**2)
            v = num / den
        taps[n + i] = v
        taps[n - i] = v
    return (taps / np.sqrt(np.sum(taps**2))).astype(np.float32)


# ---------------------------------------------------------------------------
# streaming FIR (complex data, real taps)
# ---------------------------------------------------------------------------

def fir_init(n_taps: int, batch: int = 1) -> jnp.ndarray:
    """Zero history carry: (B, n_taps-1, 2)."""
    return jnp.zeros((batch, n_taps - 1, 2), jnp.float32)


def fir(x: jnp.ndarray, taps: np.ndarray,
        state: Optional[jnp.ndarray] = None):
    """Causal streaming FIR over (B, N, 2): y[n] = sum_k h[k] x[n-k].

    Returns (y, new_state). With the default zero state this matches the
    reference's first-call behavior (history buffer initialized to 0,
    Filter_FIR_ccr.cpp:69-141).
    """
    B, N, _ = x.shape
    T = len(taps)
    if state is None:
        state = fir_init(T, B)
    ext = jnp.concatenate([state, x], axis=1)            # (B, N+T-1, 2)
    # grouped conv: channels (re, im) filtered independently by the same taps
    lhs = ext.transpose(0, 2, 1)                         # (B, 2, N+T-1)
    rhs = jnp.broadcast_to(jnp.asarray(taps[::-1].copy(), jnp.float32),
                           (2, 1, T))
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID", feature_group_count=2,
        dimension_numbers=("NCH", "OIH", "NCH"))
    new_state = ext[:, -(T - 1):] if T > 1 else state
    return y.transpose(0, 2, 1), new_state


@functools.lru_cache(maxsize=None)
def _banded_matrix(taps_key: tuple, Hb: int) -> np.ndarray:
    """(n_filt * Hb, Hb + T - 1) banded weights for fir_mm: block output
    y[j] = sum_k h[k] win[j + T - 1 - k]."""
    taps_mat = np.asarray(taps_key, np.float32)
    n_filt, T = taps_mat.shape
    W = np.zeros((n_filt * Hb, Hb + T - 1), np.float32)
    for f in range(n_filt):
        for j in range(Hb):
            W[f * Hb + j, j:j + T] = taps_mat[f, ::-1]
    return W


def fir_mm(x: jnp.ndarray, taps_mat: np.ndarray,
           state: Optional[jnp.ndarray] = None, block: int = 512):
    """Multi-filter causal streaming FIR as ONE banded matmul on the MXU:
    y_f[n] = sum_k h_f[k] x[n-k] for every filter f at once.

    Semantically identical to n_filt calls of ``fir`` (same carried
    history, shared across filters since the input is shared), but the
    depthwise conv that ``fir`` lowers to runs ~200x off MXU peak on TPU
    — reformulated here as block windows (overlap factor
    (block+T-1)/block) times a banded weight matrix, the dense-flop
    overhead is (block+T-1)/T and the MXU does the rest.  Summation
    order differs from the conv lowering, so results match ``fir`` to
    f32 round-off (not bit-exact).

    x (B, N, 2) -> y (n_filt, B, N, 2), new_state (B, T-1, 2).
    """
    B, N, _ = x.shape
    taps_mat = np.atleast_2d(np.asarray(taps_mat, np.float32))
    n_filt, T = taps_mat.shape
    if state is None:
        state = fir_init(T, B)
    # block >= T-1 so each block's halo lies wholly in the next block
    # (small N just pads up)
    Hb = max(min(block, N), T - 1, 8)
    nblk = -(-N // Hb)
    # pad the stream to (nblk+1)*Hb total so the shifted halo reshape is
    # full-size; the pad tail only lands in discarded window columns
    pad = (nblk + 1) * Hb - (N + T - 1)
    ext = jnp.concatenate(
        [state, x] + ([jnp.zeros((B, pad, 2), jnp.float32)] if pad > 0
                      else []),
        axis=1)                                      # (B, (nblk+1)*Hb, 2)
    C = Hb + T - 1
    main = ext[:, :nblk * Hb].reshape(B, nblk, Hb, 2)
    halo = ext[:, Hb:(nblk + 1) * Hb].reshape(B, nblk, Hb, 2)[:, :, :T - 1]
    win = jnp.concatenate([main, halo], axis=2)      # (B, nblk, C, 2)
    W = jnp.asarray(_banded_matrix(
        tuple(map(tuple, taps_mat.tolist())), Hb))
    flat = win.transpose(0, 1, 3, 2).reshape(B * nblk * 2, C)
    y = jax.lax.dot_general(flat, W,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y.reshape(B, nblk, 2, n_filt, Hb)
    y = y.transpose(3, 0, 1, 4, 2).reshape(n_filt, B, nblk * Hb, 2)[:, :, :N]
    new_state = ext[:, N:N + T - 1] if T > 1 else state
    return y, new_state


def upfir_mm(x: jnp.ndarray, taps: np.ndarray, osf: int,
             state: Optional[jnp.ndarray] = None):
    """Polyphase upsampling FIR on the MXU: drop-in for ``upfir`` (same
    state shape/semantics) with the osf phase sub-filters h_p[k] =
    taps[osf k + p] run as ONE multi-filter banded matmul (fir_mm) over
    the symbol stream and the outputs interleaved —
    y[osf n + p] = sum_k h_p[k] x[n-k], exactly the zero-stuffed conv.
    The lhs-dilated conv form lowers depthwise (~200x off MXU peak,
    like ``fir``); this form matches it to f32 round-off."""
    B, N, _ = x.shape
    T = len(taps)
    n_hist = (T + osf - 1) // osf
    if state is None:
        state = jnp.zeros((B, n_hist, 2), jnp.float32)
    Tp = n_hist                                   # phase filter length
    ph = np.zeros((osf, Tp), np.float32)
    for p in range(osf):
        sub = np.asarray(taps, np.float32)[p::osf]
        ph[p, :len(sub)] = sub
    # fir_mm carries Tp-1 symbols; upfir's state keeps n_hist (one more,
    # conservatively) — feed the newest Tp-1
    y, _ = fir_mm(x, ph, state[:, -(Tp - 1):] if Tp > 1 else None)
    out = jnp.stack([y[p] for p in range(osf)], axis=2)   # (B, N, osf, 2)
    out = out.reshape(B, N * osf, 2)
    ext = jnp.concatenate([state, x], axis=1)
    return out, ext[:, -n_hist:]


def upfir(x: jnp.ndarray, taps: np.ndarray, osf: int,
          state: Optional[jnp.ndarray] = None):
    """Polyphase upsampling FIR (the UPRRC shaping filter): (B, N, 2) ->
    (B, N*osf, 2). Equivalent to upsample-by-osf then FIR (zero-stuffed),
    implemented with lhs dilation so XLA keeps it dense."""
    B, N, _ = x.shape
    T = len(taps)
    n_hist = (T + osf - 1) // osf  # history in input samples
    if state is None:
        state = jnp.zeros((B, n_hist, 2), jnp.float32)
    ext = jnp.concatenate([state, x], axis=1)
    lhs = ext.transpose(0, 2, 1)
    rhs = jnp.broadcast_to(jnp.asarray(taps[::-1].copy(), jnp.float32),
                           (2, 1, T))
    # causal conv over the zero-stuffed stream: pad T-1 left (history zeros
    # before the dilated signal) and osf-1 right (trailing stuffed zeros)
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(T - 1, osf - 1)],
        lhs_dilation=(osf,), feature_group_count=2,
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = y.transpose(0, 2, 1)[:, n_hist * osf:]
    new_state = ext[:, -n_hist:]
    return y, new_state


def farrow_taps(mu) -> jnp.ndarray:
    """4 piecewise-parabolic coefficients b(mu) (Filter_Farrow_ccr_naive
    ::set_mu): applied to x[n-3..n] to interpolate at fractional delay."""
    mu = jnp.asarray(mu, jnp.float32)
    half_mu = 0.5 * mu
    half_mu_sq = half_mu * mu
    b0 = half_mu_sq - half_mu
    b1 = 1.0 - half_mu - half_mu_sq
    b2 = mu + half_mu - half_mu_sq
    return jnp.stack([b0, b1, b2, b0])


def fractional_delay(x: jnp.ndarray, mu,
                     state: Optional[jnp.ndarray] = None):
    """Farrow fractional delay of a (B, N, 2) stream by ``mu`` in [0,1)."""
    B = x.shape[0]
    if state is None:
        state = jnp.zeros((B, 3, 2), jnp.float32)
    b = farrow_taps(mu)
    ext = jnp.concatenate([state, x], axis=1)
    # y[n] = b0 x[n-3] + b1 x[n-2] + b2 x[n-1] + b3 x[n]
    y = (b[0] * ext[:, :-3] + b[1] * ext[:, 1:-2]
         + b[2] * ext[:, 2:-1] + b[3] * ext[:, 3:])
    return y, ext[:, -3:]


def integer_delay(x: jnp.ndarray, delay: int,
                  state: Optional[jnp.ndarray] = None):
    """Delay a (B, N, 2) stream by ``delay`` samples (static)."""
    if delay == 0:
        return x, state
    B = x.shape[0]
    if state is None:
        state = jnp.zeros((B, delay, 2), jnp.float32)
    ext = jnp.concatenate([state, x], axis=1)
    return ext[:, :x.shape[1]], ext[:, x.shape[1]:]


def variable_delay(x: jnp.ndarray, delay: jnp.ndarray, max_delay: int,
                   state: Optional[jnp.ndarray] = None):
    """Runtime-settable per-stream integer delay (Variable_delay_cc_naive
    .hxx:8-19): delay (B,) int32 in [0, max_delay], changeable between
    calls.  The carry always holds the last ``max_delay`` samples; the
    output gathers at a per-stream offset, so the delay is a traced value
    (one gather, no recompile on change)."""
    B, N, _ = x.shape
    if state is None:
        state = jnp.zeros((B, max_delay, 2), jnp.float32)
    ext = jnp.concatenate([state, x], axis=1)          # (B, max_delay+N, 2)
    start = max_delay - jnp.asarray(delay, jnp.int32)[:, None]
    idx = jnp.clip(start + jnp.arange(N)[None, :], 0, max_delay + N - 1)
    brow = jnp.arange(B)[:, None]
    y = jnp.stack([ext[..., 0][brow, idx], ext[..., 1][brow, idx]], axis=-1)
    return y, ext[:, N:]                               # last max_delay samples


class NcoState(NamedTuple):
    n: jnp.ndarray  # () float32 phase index


def quantize_nu(nu: float) -> float:
    """Quantize a mixer frequency to a 1e-6 multiple so the 1e6 index wrap
    is phase-continuous (the reference quantizes too,
    Multiplier_sine_ccc_naive.cpp:14-22).

    ONE rule for every path: round to the NEAREST 1e-6 computed in f32 —
    bit-identical to what ``cfo_mix`` applies to traced nu, so host-
    prequantized and traced values always agree.  The reference floors in
    double instead; for every 1e-6-multiple nu (all its shipped configs)
    floor and round coincide, and for non-multiples nearest-1e-6 is the
    deliberate single-rule deviation (pinned by
    tests/test_filters.py::test_cfo_mix_traced_matches_static_nonmultiple_nu).
    """
    return float(np.round(np.float32(nu) * np.float32(1e6))
                 / np.float32(1e6))


def cfo_mix(x: jnp.ndarray, nu, state: Optional[NcoState] = None,
            conj: bool = False):
    """Multiply a (B, N, 2) stream by e^{+j 2 pi nu n} (e^{-...} if conj),
    with the persistent sample index carried in ``state``.  ``nu`` may be a
    Python float (baked into the program) or a traced scalar (so one
    compiled chain serves several CFO configs — tools/parity_full.py).
    Both kinds go through the same f32 nearest-1e-6 quantization (see
    quantize_nu), so no caller-side prequantization is required."""
    from dvbs2_tpu.ops import cplx
    if state is None:
        state = NcoState(n=jnp.float32(0.0))
    if isinstance(nu, (int, float)):
        # f32 so the omega computation below is bit-identical to the
        # traced branch (XLA constant-folds it)
        nu_q = jnp.float32(quantize_nu(nu))
    else:
        nu_q = jnp.round(jnp.asarray(nu, jnp.float32) * 1e6) / 1e6
    omega = 2.0 * np.pi * nu_q
    N = x.shape[1]
    n = jnp.mod(state.n + jnp.arange(N, dtype=jnp.float32), 1e6)
    phase = omega * n
    rot = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-1)[None]
    if conj:
        rot = jnp.stack([rot[..., 0], -rot[..., 1]], axis=-1)
    return cplx.mul(x, rot), NcoState(n=jnp.mod(state.n + N, 1e6))


def agc(x: jnp.ndarray, output_energy: float = 1.0) -> jnp.ndarray:
    """Normalize each (B, N, 2) block: y = x * sqrt(E_out) / std(x), with the
    mean-removed complex std (Multiplier_AGC_cc_naive.cpp:23-46)."""
    from dvbs2_tpu.ops import cplx
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(cplx.abs2(x - mean), axis=1)[..., None, None]
    return x * (np.sqrt(output_energy) / jnp.sqrt(var))


def sequence_multiply(x: jnp.ndarray, seq: jnp.ndarray) -> jnp.ndarray:
    """Elementwise complex multiply of a (B, N, 2) stream by a fixed (N, 2)
    complex sequence (Multiplier_sequence_ccc_naive.cpp:10-35)."""
    from dvbs2_tpu.ops import cplx
    return cplx.mul(x, jnp.asarray(seq, jnp.float32)[None])


def unit_delay(x: jnp.ndarray, state: Optional[jnp.ndarray] = None):
    """One-block (frame) delay: emit the previous call's block, zeros first
    (Filter_unit_delay.cpp:23-44).  Returns (delayed, new_state=x)."""
    if state is None:
        state = jnp.zeros_like(x)
    return state, x


def fading_gains(snr_list: list, esn0_ref: float) -> np.ndarray:
    """Per-frame gain sequence from (esn0_dB, n_frames) pairs — the
    Multiplier_fading_DVBS2 schedule (Multiplier_fading_DVBS2.cpp:12-56):
    gain = sqrt(10^((esn0 - esn0_ref)/10)), held for n_frames frames."""
    gains = []
    for esn0, n in snr_list:
        gains.extend([np.sqrt(10.0 ** ((esn0 - esn0_ref) / 10.0))] * int(n))
    return np.asarray(gains, dtype=np.float32)


def read_fading_file(path: str) -> list:
    """Es/N0 sequence file: lines of 'esn0 frame_count'."""
    out = []
    for line in open(path):
        toks = line.split()
        if len(toks) >= 2:
            out.append((float(toks[0]), int(toks[1])))
    return out
