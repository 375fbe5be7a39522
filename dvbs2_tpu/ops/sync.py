"""RX synchronization chain, TPU-native.

Equivalents of the reference's Synchronizer_* family (SURVEY.md §2 rows
18-26). Feedback-loop DSP (Gardner, PLLs) is a ``lax.scan`` over time with an
explicit small carry — per-sample cost is amortized by batching B independent
sample streams on the lane axis (the reference's INTER strategy applied to
the sequential part of the chain). Everything feedforward (frame-sync
correlation, L&R, phase LS fit) is vectorized, no scan.

Genie (PERFECT) variants mirror the reference's test oracles:
  - timing_perfect:  known channel delay -> fixed strobe pattern + Farrow mu
                     (Synchronizer_timing_perfect.cpp:14-47)
  - frame_perfect:   known frame delay -> fixed realignment
                     (Synchronizer_frame_perfect.cpp:26-53)
  - coarse_perfect:  derotation by the known CFO
                     (Synchronizer_freq_coarse_perfect.cpp:22-51)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import cplx, filters, scrambler


# ---------------------------------------------------------------------------
# timing recovery — genie
# ---------------------------------------------------------------------------

class TimingPerfect(NamedTuple):
    nco0: float
    mu: float


def timing_perfect_params(channel_delay: float, osf: int) -> TimingPerfect:
    """Strobe phase + Farrow mu for a known channel delay
    (Synchronizer_timing_perfect ctor)."""
    frac = channel_delay - np.floor(channel_delay)
    int_delay = channel_delay - frac + 3.0          # +3 = Farrow buffer delay
    nco0 = osf - (int(int_delay) % osf)
    return TimingPerfect(nco0=float(nco0), mu=float(1.0 - frac))


def timing_perfect(x: jnp.ndarray, channel_delay: float, osf: int,
                   frac_state: Optional[jnp.ndarray] = None,
                   sample_offset: int = 0):
    """Genie timing sync on a (B, N, 2) stream: Farrow at fixed mu + fixed
    strobe pattern. Returns (y, strobe(B,N) int8, new_frac_state)."""
    p = timing_perfect_params(channel_delay, osf)
    y, st = filters.fractional_delay(x, p.mu, frac_state)
    n = np.arange(x.shape[1]) + sample_offset
    strobe = (((p.nco0 + n).astype(np.int64) % osf) == 0).astype(np.int8)
    strobe = jnp.broadcast_to(jnp.asarray(strobe), x.shape[:2])
    return y, strobe, st


# ---------------------------------------------------------------------------
# strobed-symbol extraction (Synchronizer_timing.hxx:262-304)
# ---------------------------------------------------------------------------

class ExtractState(NamedTuple):
    buf: jnp.ndarray     # (B, cap, 2) carry ring
    count: jnp.ndarray   # (B,) symbols currently in carry


def extract_init(batch: int, cap: int) -> ExtractState:
    return ExtractState(buf=jnp.zeros((batch, cap, 2), jnp.float32),
                        count=jnp.zeros((batch,), jnp.int32))


def extract_strobed(y: jnp.ndarray, strobe: jnp.ndarray, n_out: int,
                    state: ExtractState):
    """Compact strobed samples of a (B, N, 2) block into exactly ``n_out``
    symbols per stream, carrying the excess; underflow flag when short
    (the TPU analogue of the reference's processing_aborted).

    Returns (symbols (B, n_out, 2), new_state, underflow (B,) bool).
    """
    B, N, _ = y.shape
    cap = state.buf.shape[1]
    # target slot for each strobed sample: carry_count + (#strobes before it)
    csum = jnp.cumsum(strobe.astype(jnp.int32), axis=1)
    slots = state.count[:, None] + csum - 1
    total = state.count + csum[:, -1]
    # scatter into [carry | workspace] of size cap + N (per re/im plane to
    # keep TPU layouts dense)
    work = jnp.concatenate(
        [state.buf, jnp.zeros((B, N, 2), jnp.float32)], axis=1)
    dump = cap + N  # out-of-range slot for unstrobed samples
    idx = jnp.where(strobe > 0, slots, dump)
    work_r = work[..., 0]
    work_i = work[..., 1]
    brow = jnp.arange(B)[:, None]
    # NOTE: do NOT pass indices_are_sorted/unique_indices hints here —
    # the dump index (cap+N) is interleaved between the increasing slots
    # and repeated, so neither property holds for the full index array;
    # with the hints the TPU lowering silently mis-scatters for some
    # strobe patterns (measured round 4: NaN-poisoned acquisition
    # correlators for ~2/64 streams at B=64).  The tracking hot path
    # avoids this scatter entirely via extract_strobed_fast.
    work_r = work_r.at[brow, idx].set(y[..., 0], mode="drop")
    work_i = work_i.at[brow, idx].set(y[..., 1], mode="drop")
    work = jnp.stack([work_r, work_i], axis=-1)
    symbols = work[:, :n_out]
    underflow = total < n_out
    # On underflow the reference keeps its accumulated symbols and aborts the
    # iteration (processing_aborted, Synchronizer_timing.hxx:302): nothing is
    # consumed, the partial output is garbage, and the harness bumps the
    # TX->RX frame lag. Mirror that: consume n_out symbols only when full.
    rem = jnp.where(underflow, total, total - n_out)
    rem = jnp.clip(rem, 0, cap)
    shift = jnp.where(underflow, 0, n_out)
    shift_idx = jnp.minimum(shift[:, None] + jnp.arange(cap)[None, :],
                            cap + N - 1)
    new_buf = jnp.stack([work_r[brow, shift_idx], work_i[brow, shift_idx]],
                        axis=-1)
    mask = (jnp.arange(cap)[None, :] < rem[:, None])[..., None]
    new_buf = jnp.where(mask, new_buf, 0.0)
    return symbols, ExtractState(buf=new_buf, count=rem), underflow


def _shift_axis1(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Static shift along axis 1, zero-filled: out[:, j] = x[:, j-k]."""
    if k == 0:
        return x
    if abs(k) >= x.shape[1]:
        return jnp.zeros_like(x)
    B = x.shape[0]
    tail = x.shape[2:]
    if k > 0:
        z = jnp.zeros((B, k) + tail, x.dtype)
        return jnp.concatenate([z, x[:, :x.shape[1] - k]], axis=1)
    z = jnp.zeros((B, -k) + tail, x.dtype)
    return jnp.concatenate([x[:, -k:], z], axis=1)


def _var_shift(x: jnp.ndarray, n: jnp.ndarray, max_n: int, sign: int):
    """Per-stream variable shift (right for sign=+1: out[:, j] =
    x[:, j-n_b]; left for -1), zero-filled, via log-depth masked static
    shifts — dense ops instead of a ~10-20 ns/element generic per-stream
    gather.  (A coarse-block take_along + fine-rolls variant was
    measured SLOWER here — the per-row block gather over ~500 blocks
    lowers poorly — unlike the frame-sync realign where the window is
    only ~18 blocks; keep the pure roll form.)"""
    for bit in range(max(int(max_n).bit_length(), 1)):
        sh = 1 << bit
        shifted = _shift_axis1(x, sign * sh)
        take = ((n >> bit) & 1) > 0
        x = jnp.where(take.reshape((-1,) + (1,) * (x.ndim - 1)), shifted, x)
    return x


def _var_shift_right(x: jnp.ndarray, n: jnp.ndarray, max_n: int):
    return _var_shift(x, n, max_n, 1)


def _var_shift_left(x: jnp.ndarray, n: jnp.ndarray, max_n: int):
    return _var_shift(x, n, max_n, -1)


# Max |slot drift| from pure strobe alternation the fast tracking-mode
# extraction can express within one step (each blocked-Gardner tail can
# slip the pattern by at most one sample and the chatter is mean-
# reverting; beyond this the stream is declared underflowed/slipped,
# the same recovery path as a timing-loop underflow).  The compaction
# cost is (2R+1) full passes, so R is sized to the drift actually seen
# in lock: slips accumulate d by 1 each, so R=4 tolerates 4 slips inside
# ONE step (slip rate in lock ~1e-5/frame; out-of-spec patterns raise
# `overflow` exactly as before — round-5 perf pass, was 8).
EXTRACT_MAX_DRIFT = 4


def _cumsum_mxu(x: jnp.ndarray, G: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum along axis 1 as a G-blocked MXU matmul:
    inner prefix = x @ tril-ones (one small matmul per block), outer
    prefix over the G-block totals (an array G-times smaller), broadcast
    add.  The native jnp.cumsum lowers to ~log2(n) full-array passes
    (measured 2.2x slower at bench geometry, tools/probe_cumsum.py);
    exact for int inputs while block totals stay < 2^24 (here <= 2G)."""
    Bsh = x.shape[:-1]
    Pn = x.shape[-1]
    if Pn <= 2 * G:
        return jnp.cumsum(x, axis=-1)
    nb = -(-Pn // G)
    xp = jnp.pad(x.reshape(-1, Pn), ((0, 0), (0, nb * G - Pn)))
    xb = xp.reshape(-1, nb, G).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((G, G), jnp.float32))
    inner = jnp.einsum("bng,hg->bnh", xb, tri,
                       preferred_element_type=jnp.float32)
    sums = inner[:, :, -1]
    off = jnp.cumsum(sums, axis=1) - sums
    out = (inner + off[:, :, None]).reshape(-1, nb * G)[:, :Pn]
    return out.reshape(Bsh + (Pn,)).astype(x.dtype)


def extract_strobed_fast(y: jnp.ndarray, strobe: jnp.ndarray, n_out: int,
                         state: ExtractState):
    """Tracking-mode strobed-symbol compaction without scatters/gathers.

    Bit-equivalent to ``extract_strobed`` whenever the strobe pattern
    stays within EXTRACT_MAX_DRIFT of sample-pair alternation over the
    block (guaranteed in tracking, where the Gardner emits alternating
    strobes with rare single-sample slips); otherwise the affected
    stream is flagged underflowed (the slip-recovery path).  All data
    movement is dense: the per-pair compaction is a (2R+1)-pass masked
    shifted add and the carry splice two log-depth variable shifts —
    the generic scatter/gather formulation paid ~10-20 ns/element on
    TPU (~540 ms/step at bench geometry; this runs in ~30 ms).
    """
    B, N, _ = y.shape
    cap = state.buf.shape[1]
    P = N // 2
    R = EXTRACT_MAX_DRIFT
    s2 = strobe.reshape(B, P, 2).astype(jnp.int32)
    c2 = s2[:, :, 0] + s2[:, :, 1]                    # (B, P) in 0..2
    yp = y.reshape(B, P, 2, 2)
    C = _cumsum_mxu(c2)                               # inclusive counts
    base = C - c2                                     # first slot of pair p
    p_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    d = base - p_idx                                  # (B, P) drift
    overflow = jnp.any(jnp.abs(d) > R, axis=1) | \
        jnp.any((jnp.abs(d + 1) > R) & (c2 == 2), axis=1)

    # first symbol of each pair: y0 if strobed else y1
    v1 = jnp.where(s2[:, :, 0, None] > 0, yp[:, :, 0], yp[:, :, 1])
    v1 = jnp.where((c2 > 0)[..., None], v1, 0.0)
    v2 = jnp.where((c2 == 2)[..., None], yp[:, :, 1], 0.0)

    # place pair p's symbols at relative slots p + d[p] (and +1 for the
    # second) by summing (2R+1) masked static shifts — slots are a
    # contiguous enumeration, so each receives exactly one contribution.
    # (Measured round 5, tools/probe_extract.py: each term materializes
    # the accumulator — XLA does not fuse the multi-term sum even in a
    # concat-free pure-slice form, so the cost is ~1.7 ms/term at bench
    # geometry plus ~8 ms of v1/v2 construction; the known next step is
    # a VMEM-resident Pallas compaction, ROOFLINE.md §5.)
    out = jnp.zeros((B, P + R + 1, 2), jnp.float32)
    padv1 = jnp.pad(v1, ((0, 0), (0, R + 1), (0, 0)))
    padv2 = jnp.pad(v2, ((0, 0), (0, R + 1), (0, 0)))
    padd = jnp.pad(d, ((0, 0), (0, R + 1)), constant_values=10 * R)
    padc2 = jnp.pad(c2, ((0, 0), (0, R + 1)))
    for sdrift in range(-R, R + 1):
        m1 = (padd == sdrift)[..., None]
        out = out + _shift_axis1(jnp.where(m1, padv1, 0.0), sdrift)
        m2 = ((padd == sdrift - 1) & (padc2 == 2))[..., None]
        out = out + _shift_axis1(jnp.where(m2, padv2, 0.0), sdrift)

    count = state.count                               # (B,) carried symbols
    total = count + C[:, -1]
    # underflow = real symbol shortfall (the slip-recovery path, same as
    # extract_strobed); overflow = the drift bound was exceeded, so this
    # block's symbol VALUES are unreliable but the COUNT bookkeeping is
    # still exact (C comes from the true strobes) — consume normally and
    # let the caller invalidate the step's frames without a slip bump.
    # The carried remainder (<= carry-level, ~1 symbol in lock) may hold
    # unreliable values into the next step's first frame; overflow only
    # fires on out-of-spec patterns (un-acquired pull-in) where frames
    # are failing anyway, so that residue is accepted and documented
    # rather than double-flagged
    underflow = total < n_out

    # final symbols: carry first, then the compacted stream
    M = n_out
    shifted = _var_shift_right(out[:, :M], count, cap)
    carry_pad = jnp.pad(state.buf[:, :, :],
                        ((0, 0), (0, max(M - cap, 0)), (0, 0)))[:, :M]
    k_idx = jnp.arange(M)[None, :, None]
    symbols = jnp.where(k_idx < count[:, None, None], carry_pad, shifted)

    # new carry = S[n_out : n_out+rem] of the conceptual stream
    # S = [carry(count) | compacted(C[-1])] when consuming, or S[:rem]
    # when underflowed (consume nothing) — mirroring extract_strobed.
    rem = jnp.where(underflow, jnp.minimum(total, cap),
                    jnp.clip(total - n_out, 0, cap))
    out_cap = out[:, :cap]
    if out_cap.shape[1] < cap:
        out_cap = jnp.pad(out_cap,
                          ((0, 0), (0, cap - out_cap.shape[1]), (0, 0)))
    kcap = jnp.arange(cap)[None, :, None]
    # leftover old-carry symbols (only when count > n_out): carry[n_out:]
    carA = (jnp.zeros_like(state.buf) if n_out >= cap
            else jnp.pad(state.buf[:, n_out:],
                         ((0, 0), (0, min(n_out, cap)), (0, 0))))
    over = jnp.maximum(count - n_out, 0)
    startS = jnp.maximum(n_out - count, 0)       # first kept stream symbol
    # the kept stream symbols out[startS + j], j < cap all lie in the
    # STATIC window [max(n_out - cap, 0), n_out + cap) because
    # count <= cap — so slice that small window first and variable-shift
    # only it, instead of log-shifting the full (B, P, 2) workspace
    # (bit_length(n_out) ~ 18 full passes, measured ~60 ms/step at bench
    # geometry; the windowed form is ~100x less traffic)
    lo = max(n_out - cap, 0)
    win = out[:, lo:n_out + cap]
    strmB = _var_shift_left(win, startS - lo, win.shape[1])[:, :cap]
    if strmB.shape[1] < cap:
        strmB = jnp.pad(strmB,
                        ((0, 0), (0, cap - strmB.shape[1]), (0, 0)))
    strmB = _var_shift_right(strmB, over, cap)
    consume_buf = jnp.where(kcap < over[:, None, None], carA, strmB)
    # on underflow keep [carry | new symbols] like the scatter path
    uf_buf = jnp.where(kcap < count[:, None, None],
                       state.buf,
                       _var_shift_right(out_cap, count, cap))
    new_buf = jnp.where(underflow[:, None, None], uf_buf, consume_buf)
    mask = (jnp.arange(cap)[None, :] < rem[:, None])[..., None]
    new_buf = jnp.where(mask, new_buf, 0.0)
    return symbols, ExtractState(buf=new_buf, count=rem.astype(jnp.int32)), \
        underflow, overflow


# ---------------------------------------------------------------------------
# frame synchronization — genie
# ---------------------------------------------------------------------------

def frame_perfect(x: jnp.ndarray, frame_delay: int,
                  state: Optional[jnp.ndarray] = None):
    """Genie frame sync: realign a (B, N_sym, 2) symbol stream by a fixed
    delay of N/2 - frame_delay symbols (Synchronizer_frame_perfect ctor)."""
    N = x.shape[1]
    d = (N // 2 - frame_delay) % N
    return filters.integer_delay(x, d, state)


# ---------------------------------------------------------------------------
# coarse frequency — genie
# ---------------------------------------------------------------------------

def coarse_perfect(x: jnp.ndarray, freq_shift: float,
                   state: Optional[filters.NcoState] = None):
    """Derotate by the known CFO (Synchronizer_freq_coarse_perfect)."""
    return filters.cfo_mix(x, freq_shift, state, conj=True)


# ---------------------------------------------------------------------------
# coarse frequency PLL (Synchronizer_freq_coarse_DVBS2_aib.cpp)
# ---------------------------------------------------------------------------

class CoarseState(NamedTuple):
    """Pilot-aided 2nd-order PLL + DDS mixer state, one per stream.

    Mirrors the reference's members (Synchronizer_freq_coarse_DVBS2_aib.hpp):
    nu is the DDS mixer frequency (= -estimated_freq quantized to 1e-6), n the
    persistent phase index of the sine multiplier (phase = 2*pi*nu*n, wraps at
    1e6 — Multiplier_sine_ccc_naive.cpp:69-74).
    """
    nu: jnp.ndarray        # (B,) f32 DDS mixer nu
    n: jnp.ndarray         # (B,) f32 DDS phase index
    lf: jnp.ndarray        # (B,) f32 loop_filter_state
    integ: jnp.ndarray     # (B,) f32 integ_filter_state
    dds_prev: jnp.ndarray  # (B,) f32 DDS_prev_in
    prev: jnp.ndarray      # (B, 2) previous pilot symbol
    prev2: jnp.ndarray     # (B, 2) symbol before that
    curr_idx: jnp.ndarray  # (B,) i32 symbol index within the PL frame
    est_freq: jnp.ndarray  # (B,) f32 estimated CFO (cycles/sample)


def coarse_init(batch: int, frame_len: int) -> CoarseState:
    z = jnp.zeros((batch,), jnp.float32)
    return CoarseState(nu=z, n=z, lf=z, integ=z, dds_prev=z,
                       prev=jnp.zeros((batch, 2), jnp.float32),
                       prev2=jnp.zeros((batch, 2), jnp.float32),
                       curr_idx=jnp.full((batch,), frame_len - 1, jnp.int32),
                       est_freq=z)


def coarse_gains(damping: float, norm_bandwidth: float):
    """PI gains (K1, K2) for pll_sps=1
    (Synchronizer_freq_coarse_DVBS2_aib::set_PLL_coeffs)."""
    kd = 2.0          # phase_error_detector_gain
    k0 = 1.0          # phase_recovery_gain (= pll_sps)
    theta = norm_bandwidth / (damping + 0.25 / damping)
    d = 1.0 + 2.0 * damping * theta + theta * theta
    kp = (4.0 * damping * theta / d) / (kd * k0)
    ki = (4.0 * theta * theta / d) / (kd * k0)
    return kp, ki


@functools.lru_cache(maxsize=None)
def scrambled_pilot_table(modcod: str) -> np.ndarray:
    """(L, 2) expected scrambled-pilot symbols: 0 for idx<90, else
    exp(j*pi/2*(R(idx-90)+0.5)) (reference ctor, the PL-scrambled (1+j)/sqrt2
    pilot). Only the pilot positions are ever read."""
    cfg = Config(modcod=modcod)
    L = cfg.pl_frame_size
    rn = scrambler.pl_scramble_rn(L - 90).astype(np.float64)
    tab = np.zeros(L, dtype=np.complex128)
    tab[90:] = np.exp(1j * np.pi / 2 * (rn + 0.5))
    return cplx.from_np(tab)


def coarse_update_phase(cs: CoarseState, spl: jnp.ndarray,
                        strobe: jnp.ndarray, kp: float, ki: float,
                        sps: int, table: jnp.ndarray,
                        frame_len: int) -> CoarseState:
    """PLL update on one strobed symbol (masked where strobe is False).

    Port of Synchronizer_freq_coarse_DVBS2_aib::update_phase: on scrambled-
    pilot positions (idx%1476 in [54,90) and idx>=1530) the phase error is
    imag(spl*p[idx-2]*conj(prev2*p[idx])); PI loop drives the DDS at
    -estimated_freq.
    """
    idx = cs.curr_idx
    rem = idx % 1476
    on_pilot = (rem >= 54) & (rem < 90) & (idx >= 1530) & strobe
    at_reset = (rem == 90) & (idx >= 1530) & strobe

    p2i = (idx - 2) % frame_len
    pi_cur = table[idx]                                  # (B, 2)
    pi_p2 = table[p2i]
    err_c = cplx.mul_conj(cplx.mul(spl, pi_p2), cplx.mul(cs.prev2, pi_cur))
    e = jnp.where(on_pilot, err_c[..., 1], 0.0)

    lf = cs.lf + e * ki
    integ = jnp.where(on_pilot, cs.integ + cs.dds_prev, cs.integ)
    dds_prev = jnp.where(on_pilot, e * kp + lf, cs.dds_prev)
    est_freq = jnp.where(on_pilot, integ / sps, cs.est_freq)
    # mixer nu = -estimated_freq quantized to 1e-6 (Multiplier_sine set_nu)
    nu = jnp.where(on_pilot, jnp.floor(-est_freq * 1e6) / 1e6, cs.nu)

    prev = jnp.where(on_pilot[:, None], spl,
                     jnp.where(at_reset[:, None], 0.0, cs.prev))
    prev2 = jnp.where(on_pilot[:, None], cs.prev,
                      jnp.where(at_reset[:, None], 0.0, cs.prev2))
    curr_idx = jnp.where(strobe, (idx + 1) % frame_len, idx)
    return CoarseState(nu=nu, n=cs.n, lf=lf, integ=integ, dds_prev=dds_prev,
                       prev=prev, prev2=prev2, curr_idx=curr_idx,
                       est_freq=est_freq)


def coarse_mix(x: jnp.ndarray, cs: CoarseState):
    """Tracking-mode derotation: multiply a (B, N, 2) stream by
    e^{j 2 pi nu_b n} with per-stream frozen nu and the persistent phase
    index carried in the state (Synchronizer_freq_coarse::_synchronize =
    mult.imultiply)."""
    N = x.shape[1]
    n = jnp.mod(cs.n[:, None] + jnp.arange(N, dtype=jnp.float32)[None, :],
                1e6)
    phase = (2.0 * np.pi) * cs.nu[:, None] * n
    rot = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-1)
    return cplx.mul(x, rot), cs._replace(n=jnp.mod(cs.n + N, 1e6))


# ---------------------------------------------------------------------------
# step-MF acquisition (Synchronizer_step_mf_cc.cpp:184-208)
# ---------------------------------------------------------------------------

class StepMfState(NamedTuple):
    coarse: CoarseState
    mf: jnp.ndarray          # (B, T, 2) matched-filter shift register
    gardner: "GardnerState"


def step_mf_init(batch: int, cfg: Config) -> StepMfState:
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    return StepMfState(
        coarse=coarse_init(batch, cfg.pl_frame_size),
        mf=jnp.zeros((batch, len(taps), 2), jnp.float32),
        gardner=gardner_init(batch, cfg.shp_osf),
    )


def step_mf_scan(x: jnp.ndarray, cfg: Config, state: StepMfState,
                 norm_bandwidth: float):
    """Fused per-sample acquisition loop on a (B, N, 2) stream: coarse-PLL
    DDS mix -> matched-filter step -> Gardner step; every strobed symbol
    feeds the PLL phase detector (Synchronizer_step_mf_cc::_synchronize).

    Returns (y (B,N,2), strobe (B,N) int8, new state). ``state.coarse.
    curr_idx`` must be set by the caller from the frame-sync DEL feedback
    before each frame (see acquisition.py).
    """
    B, N, _ = x.shape
    osf = cfg.shp_osf
    taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
    taps_rev = jnp.asarray(taps[::-1].copy())            # h[T-1-j] at slot j
    g_kp, g_ki = gardner_gains(cfg)
    c_kp, c_ki = coarse_gains(cfg.sfc_damping, norm_bandwidth)
    table = jnp.asarray(scrambled_pilot_table(cfg.modcod))
    L = cfg.pl_frame_size

    def step(st: StepMfState, xi):
        cs = st.coarse
        # DDS mix one sample: e^{j 2 pi nu n}
        phase = (2.0 * np.pi) * cs.nu * cs.n
        rot = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-1)
        y0 = cplx.mul(xi, rot)
        n_new = jnp.where(cs.n >= 999999.0, 0.0, cs.n + 1.0)
        cs = cs._replace(n=n_new)
        # matched-filter step
        mf = jnp.concatenate([st.mf[:, 1:], y0[:, None]], axis=1)
        y1 = jnp.einsum("btc,t->bc", mf, taps_rev)
        # Gardner step
        gst, y2, is_strobe = gardner_step(st.gardner, y1, g_kp, g_ki, osf)
        # PLL phase update on the strobed symbol
        cs = coarse_update_phase(cs, y2, is_strobe, c_kp, c_ki, osf, table, L)
        return StepMfState(coarse=cs, mf=mf, gardner=gst), \
            (y2, is_strobe.astype(jnp.int8))

    xs = x.transpose(1, 0, 2)
    state, (ys, strobes) = jax.lax.scan(step, state, xs,
                                        unroll=SCAN_UNROLL)
    return ys.transpose(1, 0, 2), strobes.T, state


# ---------------------------------------------------------------------------
# Gardner timing recovery (Synchronizer_Gardner_fast.cpp:35-132)
# ---------------------------------------------------------------------------

# Per-sample feedback scans run tens of thousands of tiny VPU iterations per
# frame batch; unrolling can amortize the scan-iteration overhead (loop
# bookkeeping + state copy) across samples without changing semantics — the
# moral counterpart of the reference's hold_size=101 batching in
# Synchronizer_Gardner_ultra_osf2.cpp:60-105.  MEASURED on the tunneled TPU
# backend: unroll=8 blows the XLA compile up pathologically (>25 min, hung)
# while unroll=1 compiles the full chain in ~1-8 min; steady-state step
# time was scan-dominated either way, so the default stays 1 and the knob
# is env-overridable for backends where unroll pays.
import os as _os
SCAN_UNROLL = int(_os.environ.get("DVBS2_SCAN_UNROLL", "1"))

class GardnerState(NamedTuple):
    farrow: jnp.ndarray     # (B, 3, 2) last input samples
    ted_buf: jnp.ndarray    # (B, osf, 2) ring of strobed outputs
    head: jnp.ndarray       # (B,) int32 ring head
    mid: jnp.ndarray        # (B,) int32 ring mid
    history: jnp.ndarray    # (B,) int32 strobe history (osf bits)
    nco: jnp.ndarray        # (B,) f32 NCO counter
    lf_prev: jnp.ndarray    # (B,) f32 loop-filter integrator
    lf_out: jnp.ndarray     # (B,) f32 loop-filter output
    mu: jnp.ndarray         # (B,) f32 current fractional delay


def gardner_init(batch: int, osf: int) -> GardnerState:
    return GardnerState(
        farrow=jnp.zeros((batch, 3, 2), jnp.float32),
        ted_buf=jnp.zeros((batch, osf, 2), jnp.float32),
        head=jnp.full((batch,), osf - 1, jnp.int32),
        mid=jnp.full((batch,), (osf - 1 - osf // 2) % osf, jnp.int32),
        history=jnp.zeros((batch,), jnp.int32),
        nco=jnp.zeros((batch,), jnp.float32),
        lf_prev=jnp.zeros((batch,), jnp.float32),
        lf_out=jnp.zeros((batch,), jnp.float32),
        mu=jnp.zeros((batch,), jnp.float32),
    )


def gardner_gains(cfg: Config) -> tuple:
    """PI loop gains from damping/bandwidth/detector gain
    (Synchronizer_Gardner_fast::set_loop_filter_coeffs)."""
    zeta, bn, kd = cfg.stm_damping, cfg.stm_norm_bandwidth, cfg.stm_detector_gain
    k0 = -1.0
    theta = bn / cfg.shp_osf / (zeta + 0.25 / zeta)
    d = (1 + 2 * zeta * theta + theta * theta) * k0 * kd
    return (4 * zeta * theta) / d, (4 * theta * theta) / d


def gardner_step(st: GardnerState, xi: jnp.ndarray, kp: float, ki: float,
                 osf: int):
    """One Gardner sample update for B lockstep streams: xi (B, 2) -> (new
    state, y (B, 2) interpolated, is_strobe (B,) bool). Exact port of the
    reference's per-sample state machine (4-case dispatch on
    (is_strobe, popcount(history))) — expressed as masked updates so all B
    streams advance in lockstep on the VPU.  osf=2 dispatches to the
    gather/scatter-free specialization (identical semantics, tested
    equivalent in tests/test_gardner_blocked.py)."""
    if osf == 2:
        return gardner_step2(st, xi, kp, ki)
    return _gardner_step_generic(st, xi, kp, ki, osf)


def _gardner_step_generic(st: GardnerState, xi: jnp.ndarray, kp: float,
                          ki: float, osf: int):
    B = xi.shape[0]
    inv_osf = 1.0 / osf

    def popcount(v):
        c = jnp.zeros_like(v)
        for b in range(osf):
            c = c + ((v >> b) & 1)
        return c

    W = st.lf_out + inv_osf
    is_strobe = (st.nco < W)
    hist = ((st.history << 1) % (1 << osf)) + is_strobe.astype(jnp.int32)
    nset = popcount(hist)

    # farrow output with per-stream mu (recomputed on strobe)
    mu = jnp.where(is_strobe, st.nco / W, st.mu)
    b = filters.farrow_taps(mu)                       # (4, B)
    ext = jnp.concatenate([st.farrow, xi[:, None]], axis=1)  # (B,4,2)
    y = (b[0][:, None] * ext[:, 0] + b[1][:, None] * ext[:, 1]
         + b[2][:, None] * ext[:, 2] + b[3][:, None] * ext[:, 3])

    nco = jnp.where(is_strobe, st.nco + 1.0 - W, st.nco - W)

    # TED error only on (strobe, popcount==1)
    brow = jnp.arange(B)
    mid_v = st.ted_buf[brow, st.mid]
    head_v = st.ted_buf[brow, st.head]
    ted_err = mid_v[:, 0] * (head_v[:, 0] - y[:, 0]) + \
        mid_v[:, 1] * (head_v[:, 1] - y[:, 1])
    active = is_strobe & (nset == 1)
    ted_err = jnp.where(active, ted_err, 0.0)

    # TED buffer update (3 cases; popcount==0 & no strobe: no update)
    single = (nset == 1)
    double = (nset > 1)
    headm1 = (st.head - 1 + osf) % osf
    buf = st.ted_buf
    # single: buf[head] = y; shift 1
    buf1 = buf.at[brow, st.head].set(y)
    # double: buf[head] = 0, buf[head-1] = y; shift 2
    buf2 = buf.at[brow, st.head].set(0.0).at[brow, headm1].set(y)
    buf = jnp.where(single[:, None, None], buf1,
                    jnp.where(double[:, None, None], buf2, buf))
    shift = jnp.where(single, 1, jnp.where(double, 2, 0))
    head = (st.head - shift + 2 * osf) % osf
    mid = (st.mid - shift + 2 * osf) % osf

    lf_prev = st.lf_prev + ted_err * ki
    lf_out = jnp.where(active, lf_prev + ted_err * kp, lf_prev)

    new = GardnerState(farrow=ext[:, 1:], ted_buf=buf, head=head,
                       mid=mid, history=hist, nco=nco, lf_prev=lf_prev,
                       lf_out=lf_out, mu=mu)
    return new, y, is_strobe


def gardner_scan(x: jnp.ndarray, cfg: Config,
                 state: Optional[GardnerState] = None):
    """Gardner TED + PI loop + NCO + Farrow on a (B, N, 2) stream.

    Returns (y (B,N,2) interpolated, strobe (B,N) int8, new_state).
    """
    B, N, _ = x.shape
    osf = cfg.shp_osf
    kp, ki = gardner_gains(cfg)
    if state is None:
        state = gardner_init(B, osf)

    def step(st: GardnerState, xi):
        new, y, is_strobe = gardner_step(st, xi, kp, ki, osf)
        return new, (y, is_strobe.astype(jnp.int8))

    xs = x.transpose(1, 0, 2)                             # (N, B, 2)
    state, (ys, strobes) = jax.lax.scan(step, state, xs,
                                        unroll=SCAN_UNROLL)
    return ys.transpose(1, 0, 2), strobes.T, state


# ---------------------------------------------------------------------------
# strobe-run blocked Gardner (Synchronizer_Gardner_ultra_osf2.cpp:60-105)
# ---------------------------------------------------------------------------

def gardner_step2(st: GardnerState, xi: jnp.ndarray, kp: float, ki: float):
    """osf=2 specialization of ``gardner_step`` — identical semantics, but
    the 2-slot TED ring becomes selects instead of per-stream gathers and
    scatters (the generic ``.at[brow, idx]`` forms lower to serialized
    scatter ops on TPU; in the blocked scan's 4-sample exact tail they
    dominated the per-block cost)."""
    osf = 2
    W = st.lf_out + 0.5
    is_strobe = (st.nco < W)
    hist = ((st.history << 1) % 4) + is_strobe.astype(jnp.int32)
    nset = (hist & 1) + ((hist >> 1) & 1)

    mu = jnp.where(is_strobe, st.nco / W, st.mu)
    b = filters.farrow_taps(mu)                       # (4, B)
    ext = jnp.concatenate([st.farrow, xi[:, None]], axis=1)  # (B,4,2)
    y = (b[0][:, None] * ext[:, 0] + b[1][:, None] * ext[:, 1]
         + b[2][:, None] * ext[:, 2] + b[3][:, None] * ext[:, 3])

    nco = jnp.where(is_strobe, st.nco + 1.0 - W, st.nco - W)

    # ring slots by value: head/mid are always the two slots of a 2-ring
    b0, b1 = st.ted_buf[:, 0], st.ted_buf[:, 1]
    head0 = (st.head == 0)
    head_v = jnp.where(head0[:, None], b0, b1)
    mid_v = jnp.where(head0[:, None], b1, b0)
    ted_err = mid_v[:, 0] * (head_v[:, 0] - y[:, 0]) + \
        mid_v[:, 1] * (head_v[:, 1] - y[:, 1])
    active = is_strobe & (nset == 1)
    ted_err = jnp.where(active, ted_err, 0.0)

    single = (nset == 1)
    double = (nset > 1)
    # single: buf[head] = y, shift 1; double: buf[head]=0, buf[head-1]=y,
    # shift 2 (mod 2: head-1 == the other slot, shift 2 == no rotation)
    headm1 = 1 - st.head
    sel_h = single | double
    new_b0 = jnp.where((head0 & single)[:, None], y,
                       jnp.where((head0 & double)[:, None], 0.0,
                                 jnp.where((~head0 & double)[:, None], y,
                                           b0)))
    new_b1 = jnp.where((~head0 & single)[:, None], y,
                       jnp.where((~head0 & double)[:, None], 0.0,
                                 jnp.where((head0 & double)[:, None], y,
                                           b1)))
    buf = jnp.stack([new_b0, new_b1], axis=1)
    shift = jnp.where(single, 1, jnp.where(double, 2, 0))
    head = (st.head - shift) % 2
    mid = (st.mid - shift) % 2
    del headm1, sel_h

    lf_prev = st.lf_prev + ted_err * ki
    lf_out = jnp.where(active, lf_prev + ted_err * kp, lf_prev)

    new = GardnerState(farrow=ext[:, 1:], ted_buf=buf, head=head,
                       mid=mid, history=hist, nco=nco, lf_prev=lf_prev,
                       lf_out=lf_out, mu=mu)
    return new, y, is_strobe


def _pick_hold(n: int, target: int, lo: int = 16, hi: int = 512,
               step: int = 1) -> int:
    """Divisor of ``n`` in [lo, hi] (on the ``step`` grid) closest to
    ``target`` so the block scan tiles the stream exactly (no per-sample
    remainder).  Returns 0 when no such divisor exists (callers fall
    back to the exact per-sample scan / unfused path)."""
    best, best_d = 0, 10 ** 9
    start = lo + (-lo) % step
    for h in range(start, min(hi, n) + 1, step):
        if n % h == 0 and abs(h - target) < best_d:
            best, best_d = h, abs(h - target)
    return best


def gardner_block(st: GardnerState, xblk: jnp.ndarray, kp: float, ki: float,
                  osf: int):
    """One ``H``-sample block of the blocked Gardner (osf=2): the first H-4
    samples assume steady lock — mu frozen (Farrow becomes a 4-tap block
    FIR) and strobes forced to alternate — so the TED errors and the PI loop
    filter collapse to vectorized prefix sums; the last 4 samples run the
    exact per-sample state machine so mu/NCO resynchronize every block.

    This is the reference's own ULTRA amortization (Synchronizer_Gardner_
    ultra_osf2.cpp:60-105, hold_size blocks with a 4-sample exact tail),
    with two refinements: (1) the NCO accumulates the exact increment
    sum(strobe - W_j) instead of the reference's sum(strobe - 1/2); (2) the
    body's interpolation mu is RE-DERIVED from the NCO at block entry
    (mu0 = nco/W at the first forced strobe) instead of freezing the
    carried mu.  (2) is load-bearing at the mu wrap boundary: mu only
    refreshes at strobes, so when the NCO wraps right at a block boundary
    the carried mu is stale by a FULL sample and a frozen-mu body would
    emit an entire block of midpoint samples (the round-3 ~2e-2 FER floor
    at integer-sample channel delays, diagnosed in tools/diag_ultra_wrap
    .py --drill); nco/W is always bookkeeping-consistent, equals the
    carried mu to within loop jitter in steady lock, and lets deferred
    mid-body wraps surface smoothly as mu drifting past [0,1) until an
    exact tail rolls them over.
    """
    B, H, _ = xblk.shape
    body = H - 4
    brow = jnp.arange(B)

    # Farrow over the body with per-stream mu derived from the NCO: the mu
    # the exact machine would compute at the first body strobe (nco/W when
    # sample 0 strobes; one -W NCO step earlier otherwise — the W drift
    # between those two samples is O(ki*e), negligible)
    s_first = 1 - (st.history & 1)
    W0 = st.lf_out + 1.0 / osf
    mu0 = jnp.where(s_first > 0, st.nco, st.nco - W0) / W0
    ext = jnp.concatenate([st.farrow, xblk[:, :body]], axis=1)  # (B,body+3,2)
    b = filters.farrow_taps(mu0)                                # (4, B)
    y = (b[0][:, None, None] * ext[:, :body]
         + b[1][:, None, None] * ext[:, 1:body + 1]
         + b[2][:, None, None] * ext[:, 2:body + 2]
         + b[3][:, None, None] * ext[:, 3:body + 3])            # (B, body, 2)

    # forced alternating strobes continuing the carried history
    s_prev = st.history & 1
    par = (jnp.arange(body) % 2).astype(jnp.int32)
    strobe = (1 - s_prev[:, None] + par[None, :]) % 2           # (B, body)

    # Gardner TED on every strobed sample: e[j] = y[j-1] . (y[j-2] - y[j])
    # (in alternating lock popcount(history)==1 at every step, so the
    # TED buffer holds exactly the last two Farrow outputs)
    ym1 = st.ted_buf[brow, st.mid]                              # y[-1]
    ym2 = st.ted_buf[brow, st.head]                             # y[-2]
    yext = jnp.concatenate([ym2[:, None], ym1[:, None], y], axis=1)
    e = (yext[:, 1:-1, 0] * (yext[:, :-2, 0] - yext[:, 2:, 0])
         + yext[:, 1:-1, 1] * (yext[:, :-2, 1] - yext[:, 2:, 1]))
    e = jnp.where(strobe > 0, e, 0.0)                           # (B, body)

    # PI loop filter as prefix sums (nothing feeds back inside the body)
    lf_prev = st.lf_prev[:, None] + ki * jnp.cumsum(e, axis=1)
    lf_out = lf_prev + kp * e
    # exact NCO increment: nco[j] = nco[j-1] + strobe[j] - (lf_out[j-1]+1/osf)
    w = (1.0 / osf) + jnp.concatenate([st.lf_out[:, None], lf_out[:, :-1]],
                                      axis=1)
    nco = st.nco + jnp.sum(strobe.astype(jnp.float32) - w, axis=1)

    # post-body carry: TED buffer = last two outputs at the rotated slots
    head = (st.head - body) % osf
    mid = (st.mid - body) % osf
    buf = st.ted_buf.at[brow, mid].set(y[:, -1]).at[brow, head].set(y[:, -2])
    hist = (strobe[:, -2] << 1) + strobe[:, -1]
    st2 = GardnerState(farrow=xblk[:, body - 3:body], ted_buf=buf, head=head,
                       mid=mid, history=hist, nco=nco,
                       lf_prev=lf_prev[:, -1], lf_out=lf_out[:, -1],
                       mu=mu0)

    # exact 4-sample tail (statically unrolled)
    ys_t, ss_t = [], []
    for t in range(4):
        st2, yt, s_t = gardner_step(st2, xblk[:, body + t], kp, ki, osf)
        ys_t.append(yt)
        ss_t.append(s_t.astype(jnp.int32))
    y_all = jnp.concatenate([y, jnp.stack(ys_t, axis=1)], axis=1)
    s_all = jnp.concatenate([strobe, jnp.stack(ss_t, axis=1)], axis=1)
    return st2, y_all, s_all.astype(jnp.int8)


def gardner_scan_blocked(x: jnp.ndarray, cfg: Config,
                         state: Optional[GardnerState] = None):
    """Blocked Gardner over a (B, N, 2) stream — same signature/carry as
    ``gardner_scan`` but scanning hold-size blocks instead of samples.
    Requires osf=2 (like the reference's ultra_osf2); any stream tail that
    doesn't tile into blocks falls back to the exact per-sample scan."""
    B, N, _ = x.shape
    osf = cfg.shp_osf
    if osf != 2:
        return gardner_scan(x, cfg, state)
    kp, ki = gardner_gains(cfg)
    if state is None:
        state = gardner_init(B, osf)
    H = _pick_hold(N, cfg.stm_hold_size)
    if H < 8:
        return gardner_scan(x, cfg, state)
    nblk = N // H

    def blk(st, xb):
        st, y, s = gardner_block(st, xb, kp, ki, osf)
        return st, (y, s)

    xs = x[:, :nblk * H].reshape(B, nblk, H, 2).transpose(1, 0, 2, 3)
    state, (ys, ss) = jax.lax.scan(blk, state, xs)
    y = ys.transpose(1, 0, 2, 3).reshape(B, nblk * H, 2)
    s = ss.transpose(1, 0, 2).reshape(B, nblk * H)
    if nblk * H < N:
        y2, s2, state = gardner_scan(x[:, nblk * H:], cfg, state)
        y = jnp.concatenate([y, y2], axis=1)
        s = jnp.concatenate([s, s2], axis=1)
    return y, s, state


def gardner(x: jnp.ndarray, cfg: Config,
            state: Optional[GardnerState] = None, act: bool = True):
    """Timing recovery dispatch on cfg.stm_type: ULTRA = blocked, else the
    exact per-sample scan (factory dispatch analogue,
    Factory/Module/Synchronizer_timing/Synchronizer_timing.cpp:71-115).

    ``act`` mirrors the reference's Synchronizer_timing act flag: the
    blocked path only engages once the harness declares lock (set_act(true)
    at transmission start, TX_RX/main.cpp:631); learning phases run exact.
    """
    if act and cfg.stm_type == "ULTRA":
        return gardner_scan_blocked(x, cfg, state)
    return gardner_scan(x, cfg, state)


# ---------------------------------------------------------------------------
# frame synchronization (Synchronizer_frame_DVBS2_fast/aib)
# ---------------------------------------------------------------------------

from dvbs2_tpu.ops import framer as _framer
from dvbs2_tpu.config import PLS_WORDS


@functools.lru_cache(maxsize=None)
def _diff_taps() -> np.ndarray:
    """89 real taps correlating the differential symbol stream against the
    differentially-encoded SOF+PLSC.

    Derived from the PLHEADER itself rather than copied from the reference
    table (Synchronizer_frame_DVBS2_fast.hpp:19-32): d_k = plh_k * conj(
    plh_{k+1}) is +-j for pi/2-BPSK; tap_k = -imag(d_k) where d_k is
    identical across all supported PLS words, 0 where modcod-dependent.
    """
    ds = []
    for mc in PLS_WORDS:
        plh = _framer.plheader(mc)
        d = plh[:-1] * np.conj(plh[1:])          # (89,)
        ds.append(np.round(np.imag(d)).astype(np.int8))
    ds = np.stack(ds)
    common = np.all(ds == ds[0], axis=0)
    taps = np.where(common, -ds[0], 0).astype(np.float32)
    assert np.all(taps[:25] != 0), "SOF taps must be modcod-independent"
    return taps


class FrameSyncState(NamedTuple):
    prev_sym: jnp.ndarray    # (B, 1, 2) last symbol of previous frame
    corr_vec: jnp.ndarray    # (B, L) EMA of correlation per frame position
    fir_state: jnp.ndarray   # (B, 88, 2) differential-FIR history
    delay_buf: jnp.ndarray   # (B, L, 2) realignment buffer (one frame)


def frame_sync_init(batch: int, frame_len: int) -> FrameSyncState:
    return FrameSyncState(
        prev_sym=jnp.concatenate([jnp.ones((batch, 1, 1), jnp.float32),
                                  jnp.zeros((batch, 1, 1), jnp.float32)],
                                 axis=-1),
        corr_vec=jnp.zeros((batch, frame_len), jnp.float32),
        fir_state=jnp.zeros((batch, 88, 2), jnp.float32),
        delay_buf=jnp.zeros((batch, frame_len, 2), jnp.float32),
    )


def frame_sync_corr(x: jnp.ndarray, state: FrameSyncState):
    """Correlation half of the frame synchronizer over a (B, M, 2) symbol
    stream (M = any whole number of frames): differential stream z_n =
    x_{n-1} conj(x_n), two real FIRs against the +-1/0 SOF/PLSC patterns,
    corr = max(|SOF+PLSC|, |SOF-PLSC|).

    Stateless w.r.t. the EMA — only prev_sym/fir_state advance — so a
    whole step's F frames run as ONE conv instead of F scanned convs
    (bit-identical: the per-frame FIR was warm-started from the previous
    frame's carry, which is exactly what the full-stream conv computes).
    Returns (corr (B, M), new_prev_sym, new_fir_state).
    """
    taps = _diff_taps()
    sof_taps = np.where(np.arange(89) < 25, taps, 0)
    plsc_taps = np.where(np.arange(89) >= 25, taps, 0)
    xprev = jnp.concatenate([state.prev_sym, x[:, :-1]], axis=1)
    z = cplx.mul_conj(xprev, x)
    zc = jnp.concatenate([state.fir_state, z], axis=1)
    # both +-1/0 pattern FIRs in ONE banded matmul (the depthwise conv
    # form ran ~200x off MXU peak and dominated the frame stage,
    # measured round 5 — filters.fir_mm)
    ps, _ = filters.fir_mm(
        zc, np.stack([sof_taps[::-1], plsc_taps[::-1]]))
    ps_sof = ps[0][:, 88:]
    ps_plsc = ps[1][:, 88:]
    corr = jnp.maximum(jnp.sqrt(cplx.abs2(ps_sof + ps_plsc)),
                       jnp.sqrt(cplx.abs2(ps_sof - ps_plsc)))
    return corr, x[:, -1:], z[:, -88:]


def frame_sync_update(x: jnp.ndarray, corr: jnp.ndarray, cfg: Config,
                      state: FrameSyncState):
    """EMA/argmax/realign half of the frame synchronizer for one (B, L, 2)
    frame whose correlation row is already computed."""
    B, L, _ = x.shape
    corr_vec = cfg.sfm_alpha * state.corr_vec + (1 - cfg.sfm_alpha) * corr
    max_idx = jnp.argmax(corr_vec, axis=1).astype(jnp.int32)
    max_corr = jnp.max(corr_vec, axis=1)
    delay = (L + max_idx - 89) % L
    flag = max_corr > cfg.sfm_trigger
    # realign: output_delay with per-stream delay (L - delay) % L, i.e.
    # out[n] = ext[start_b + n] with start_b = L - d in [0, L].  A direct
    # per-stream gather lowers to ~8 ns/element generic gather on TPU
    # (573 ms/step at bench geometry, measured); instead shift each row
    # by start_b via log2(L) masked STATIC rolls — dense contiguous
    # copies + selects the VPU streams at HBM speed.
    d = (L - delay) % L
    start = L - d                                           # (B,) in [0, L]
    ext = jnp.concatenate([state.delay_buf, x], axis=1)     # (B, 2L, 2)
    aligned = realign_window(ext, start, L)
    new_state = state._replace(corr_vec=corr_vec, delay_buf=x)
    return aligned, delay, flag, max_corr, new_state


def realign_window(ext: jnp.ndarray, start: jnp.ndarray, L: int):
    """out[n] = ext[start_b + n] for n < L, start in [0, L], on a
    (N, 2L, 2) window batch.  Two-level shift: coarse C-sample blocks via
    one take_along gather (per-(row,block) indices move C-contiguous
    slices — fast, unlike per-element gathers), then the residual < C via
    log2(C) masked static rolls.  ~5x less roll traffic than log2(L)
    full-width passes; exact vs the direct gather (pinned by the CPU
    test)."""
    B = ext.shape[0]
    C = 512
    nb_win = (L + C - 1) // C + 1              # window blocks (>= L + C)
    nb_tot = (2 * L + C - 1) // C + 1          # blocks covering all of ext
    extp = jnp.pad(ext, ((0, 0), (0, nb_tot * C - 2 * L), (0, 0)))
    blk = extp.reshape(B, nb_tot, C, 2)
    coarse = start // C                        # (B,) block offset
    bidx = coarse[:, None] + jnp.arange(nb_win)[None, :]
    bidx = jnp.clip(bidx, 0, nb_tot - 1)
    if B <= 256:
        # per-(row, block) take_along moves C-contiguous slices — fast at
        # stream-sized batches
        sel = jnp.take_along_axis(blk, bidx[:, :, None, None], axis=1)
    else:
        # at step-sized batches (B*F rows, the batched tracking path) the
        # same gather lowers ~50x worse (measured ~50 ms at 4096 rows);
        # select the blocks with an EXACT one-hot f32 batched matmul
        # instead (one nonzero per output row => bit-exact: 1*x + 0*y
        # accumulates to x even through the MXU's f32-as-bf16x3 path)
        onehot = (bidx[:, :, None] ==
                  jnp.arange(nb_tot)[None, None, :]).astype(jnp.float32)
        sel = jax.lax.dot_general(
            onehot, blk.reshape(B, nb_tot, C * 2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        sel = sel.reshape(B, nb_win, C, 2)
    win = sel.reshape(B, nb_win * C, 2)        # ext[coarse*C : ...]
    fine = start - coarse * C                  # (B,) in [0, C)
    for bit in range(int(C - 1).bit_length()):
        sh = 1 << bit
        rolled = jnp.concatenate([win[:, sh:], win[:, :sh]], axis=1)
        take = ((fine >> bit) & 1) > 0
        win = jnp.where(take[:, None, None], rolled, win)
    return win[:, :L]


def frame_sync(x: jnp.ndarray, cfg: Config, state: FrameSyncState):
    """Frame synchronization over one (B, L, 2) frame-length symbol block.

    Returns (aligned (B, L, 2), delay (B,), flag (B,), max_corr (B,), state).
    Algorithm: differential stream z_n = x_{n-1} conj(x_n); correlate with
    the +-1/0 SOF+PLSC pattern via one real FIR; corr = max(|SOF+PLSC|,
    |SOF-PLSC|) with EMA smoothing; delay = argmax; realign with a variable
    delay (Synchronizer_frame_DVBS2_aib.cpp:44-123).
    """
    corr, prev_sym, fir_state = frame_sync_corr(x, state)
    aligned, delay, flag, max_corr, st = frame_sync_update(
        x, corr, cfg, state._replace(prev_sym=prev_sym,
                                     fir_state=fir_state))
    return aligned, delay, flag, max_corr, st


# ---------------------------------------------------------------------------
# L&R fine frequency (Synchronizer_Luise_Reggiannini_DVBS2_aib.cpp:90-167)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def pilot_starts(modcod: str) -> np.ndarray:
    """Symbol indices of pilot-block starts inside a PL frame (incl. PLH)."""
    cfg = Config(modcod=modcod)
    return np.array([90 + (i + 1) * 16 * 90 + i * 36
                     for i in range(cfg.n_pilots)], dtype=np.int32)


class LrState(NamedTuple):
    r_acc: jnp.ndarray       # (B, 2) EMA of the summed autocorrelation


def lr_init(batch: int) -> LrState:
    return LrState(r_acc=jnp.zeros((batch, 2), jnp.float32))


_LR_LP, _LR_LP2 = 18, 9


def lr_acc(x: jnp.ndarray, modcod: str) -> jnp.ndarray:
    """Per-frame L&R pilot autocorrelation sum for a (N, L, 2) frame
    batch -> (N, 2).  Stateless — the EMA and derotation live in
    lr_fine_freq / frame_fine_track."""
    N = x.shape[0]
    Lp, Lp2 = _LR_LP, _LR_LP2
    starts = pilot_starts(modcod)
    # z_i = symbol * conj(pilot) * sqrt(2): (re+im, im-re)
    zs = []
    for s in starts:
        blk = x[:, s:s + Lp]
        zs.append(jnp.stack([blk[..., 0] + blk[..., 1],
                             blk[..., 1] - blk[..., 0]], axis=-1))
    z = jnp.stack(zs, axis=1)                               # (N, P, Lp, 2)
    acc = jnp.zeros((N, 2), jnp.float32)
    for m in range(1, Lp2 + 1):
        a, b = z[:, :, m:], z[:, :, :-m]
        re = jnp.sum(a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1], axis=(1, 2))
        im = jnp.sum(a[..., 1] * b[..., 0] - a[..., 0] * b[..., 1], axis=(1, 2))
        acc = acc + jnp.stack([re, im], axis=-1) / (2.0 * (Lp - m))
    return acc


def lr_f_hat(r_acc: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(r_acc[..., 1], r_acc[..., 0]) / ((_LR_LP2 + 1) * np.pi)


def lr_apply(x: jnp.ndarray, f_hat: jnp.ndarray) -> jnp.ndarray:
    """Derotate a (N, L, 2) frame batch by per-frame f_hat (N,):
    y_n = x_n * e^{-j pi f_hat 2n} (theta over symbol index)."""
    L = x.shape[1]
    n = jnp.arange(L, dtype=jnp.float32)
    theta = np.pi * f_hat[:, None] * (2.0 * n)[None, :]
    rot = jnp.stack([jnp.cos(theta), -jnp.sin(theta)], axis=-1)
    return cplx.mul(x, rot)


def lr_fine_freq(x: jnp.ndarray, cfg: Config, state: LrState):
    """Luise&Reggiannini residual CFO estimation + frame derotation on a
    descrambled (B, L, 2) PL frame. Returns (y, f_hat (B,), state)."""
    acc = lr_acc(x, cfg.modcod)
    r_acc = cfg.sff_lr_alpha * state.r_acc + (1 - cfg.sff_lr_alpha) * acc
    f_hat = lr_f_hat(r_acc)
    return lr_apply(x, f_hat), f_hat, LrState(r_acc=r_acc)


# ---------------------------------------------------------------------------
# fine phase/freq LS fit (Synchronizer_freq_phase_DVBS2_aib.cpp:44-113)
# ---------------------------------------------------------------------------

def phase_freq_fine(x: jnp.ndarray, cfg: Config):
    """Per-pilot phase estimates + unwrap + LS line fit + derotation on a
    (B, L, 2) frame. Returns (y, f_hat, phi_hat)."""
    B, L, _ = x.shape
    Lp = 36
    starts = pilot_starts(cfg.modcod)
    P = len(starts)
    ph = []
    for s in starts:
        blk = x[:, s:s + Lp]
        re = jnp.sum(blk[..., 0] + blk[..., 1], axis=1)
        im = jnp.sum(blk[..., 1] - blk[..., 0], axis=1)
        a = jnp.arctan2(im, re)
        ph.append(jnp.where(a < 0, a + 2 * np.pi, a))
    ph = jnp.stack(ph, axis=1)                              # (B, P)
    inv2pi = 1.0 / (2 * np.pi)
    diff = ph[:, 1:] - ph[:, :-1]
    acc_elt = jnp.where(diff > 0, jnp.floor(diff * inv2pi + 0.5),
                        jnp.ceil(diff * inv2pi - 0.5))
    acc_elt = jnp.where(jnp.abs(diff) > np.pi, acc_elt, 0.0)
    acc = jnp.cumsum(acc_elt, axis=1)
    y = ph * inv2pi - jnp.pad(acc, ((0, 0), (1, 0)))
    t = jnp.asarray(starts.astype(np.float32) + Lp / 2)[None, :]
    sum_t, sum_y = jnp.sum(t, 1) * jnp.ones((B,)), jnp.sum(y, 1)
    sum_ty = jnp.sum(t * y, 1)
    sum_tt = jnp.sum(t * t, 1) * jnp.ones((B,))
    f_hat = (P * sum_ty - sum_t * sum_y) / (P * sum_tt - sum_t * sum_t)
    phi_hat = (sum_y - f_hat * sum_t) / P
    n = jnp.arange(L, dtype=jnp.float32)[None, :]
    theta = 2 * np.pi * (f_hat[:, None] * n + phi_hat[:, None])
    rot = jnp.stack([jnp.cos(theta), -jnp.sin(theta)], axis=-1)
    return cplx.mul(x, rot), f_hat, phi_hat
