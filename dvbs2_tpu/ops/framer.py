"""PL framing: PLHEADER generation, pilot insertion/removal.

TPU-native design: the PLHEADER (90 complex symbols) and the data/pilot layout
are compile-time constants per modcod, so framing is a static concatenation and
deframing a static gather — no per-symbol control flow.

Behavioral reference: src/common/Module/Framer/Framer.hxx
  - PLH = 26-bit SOF + 64-bit PLS code (7-bit word x G_32_7 Reed-Muller
    generator, interleaved with its complement, scrambled by the fixed 64-bit
    sequence), pi/2-BPSK modulated (generate_plh, Framer.hxx:96-196).
  - Payload layout: PLH(90) + n_pilots x [16 slots of 90 data + 36 pilots] +
    remainder (Framer.hxx:232-293); pilots are (1+j)/sqrt(2).
  - remove_plh strips PLH + pilots (Framer.hxx:330-343).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config, M_SLOT, P_PILOT

# EN 302 307 §5.5.2 constants
SOF_BITS = np.array([0, 1, 1, 0, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 1,
                     0, 1, 0, 0, 0, 0, 0, 1, 0], dtype=np.int8)  # 0x18D2E82

PLS_SCRAMBLE = np.array([int(b) for b in
                         format(0x719D83C953422DFA, "064b")], dtype=np.int8)

# (32,7) generator of the PLS code: rows = [complement-select, RM(1,5) rows]
_G_32_7 = np.array([
    [1, 0, 0, 1, 0, 0, 0, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1],
    [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1],
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],
    [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
], dtype=np.int8)


def _pi2_bpsk(bits: np.ndarray, b0_jump: bool = False) -> np.ndarray:
    """pi/2-BPSK: even symbols at 45 deg, odd at 135 deg (EN 302 307 §5.5.2)."""
    s = (1 - 2 * bits.astype(np.float64)) / np.sqrt(2.0)
    out = np.empty(len(bits), dtype=np.complex64)
    even_re, odd_re = (-1.0, -1.0) if b0_jump else (1.0, -1.0)
    odd_im = -1.0 if b0_jump else 1.0
    out[0::2] = even_re * s[0::2] + 1j * s[0::2]
    out[1::2] = odd_re * s[1::2] + 1j * odd_im * s[1::2]
    return out


@functools.lru_cache(maxsize=None)
def plheader(modcod: str) -> np.ndarray:
    """90 complex PLHEADER symbols for a modcod."""
    cfg = Config(modcod=modcod)
    word = np.asarray(cfg.pls_word, dtype=np.int8)
    coded = (word @ _G_32_7) % 2                      # 32-bit PLS codeword
    inter = np.empty(64, dtype=np.int8)               # interleave with complement
    inter[0::2] = coded
    inter[1::2] = 1 - coded
    final = (inter + PLS_SCRAMBLE) % 2
    sof_sym = _pi2_bpsk(SOF_BITS)
    pls_sym = _pi2_bpsk(final, b0_jump=bool(word[0]))
    return np.concatenate([sof_sym, pls_sym]).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def data_positions(modcod: str) -> np.ndarray:
    """Indices of the XFEC data symbols inside a PL frame (static gather map)."""
    cfg = Config(modcod=modcod)
    pos = []
    idx = M_SLOT  # skip PLH
    remaining = cfg.N_xfec_frame
    for _ in range(cfg.n_pilots):
        pos.append(np.arange(idx, idx + 16 * M_SLOT))
        idx += 16 * M_SLOT + P_PILOT
        remaining -= 16 * M_SLOT
    pos.append(np.arange(idx, idx + remaining))
    out = np.concatenate(pos).astype(np.int32)
    assert out.size == cfg.N_xfec_frame
    return out


@functools.lru_cache(maxsize=None)
def _frame_template(modcod: str) -> np.ndarray:
    """PL frame with PLH + pilots filled in and zeros at data positions."""
    cfg = Config(modcod=modcod)
    tmpl = np.zeros(cfg.pl_frame_size, dtype=np.complex64)
    tmpl[:M_SLOT] = plheader(modcod)
    pilot = (1.0 + 1.0j) / np.sqrt(2.0)
    mask = np.ones(cfg.pl_frame_size, dtype=bool)
    mask[data_positions(modcod)] = False
    mask[:M_SLOT] = False
    tmpl[mask] = pilot
    return tmpl


@functools.lru_cache(maxsize=None)
def _segments(modcod: str):
    """Static (data_start, data_len, pl_start) runs of contiguous data symbols.

    Framing/deframing is pure slicing + concatenation — a gather over an
    (N, 2)-shaped array would pad 64x on TPU (2 of 128 lanes used).
    """
    cfg = Config(modcod=modcod)
    segs = []
    data_start, pl_start = 0, M_SLOT
    for _ in range(cfg.n_pilots):
        segs.append((data_start, 16 * M_SLOT, pl_start))
        data_start += 16 * M_SLOT
        pl_start += 16 * M_SLOT + P_PILOT
    segs.append((data_start, cfg.N_xfec_frame - data_start, pl_start))
    return tuple(segs)


def frame(xfec: jnp.ndarray, modcod: str) -> jnp.ndarray:
    """(F, N_xfec, 2) re/im symbols -> (F, pl_frame_size, 2) PL frames."""
    from dvbs2_tpu.ops import cplx
    tmpl = cplx.from_np(_frame_template(modcod))
    lead = xfec.shape[:-2]
    pieces = [jnp.broadcast_to(jnp.asarray(tmpl[:M_SLOT]), lead + (M_SLOT, 2))]
    pilot = tmpl[M_SLOT + 16 * M_SLOT:M_SLOT + 16 * M_SLOT + P_PILOT]
    cfg_npilots = len(_segments(modcod)) - 1
    for i, (ds, dl, _) in enumerate(_segments(modcod)):
        pieces.append(xfec[..., ds:ds + dl, :])
        if i < cfg_npilots:
            pieces.append(jnp.broadcast_to(jnp.asarray(pilot),
                                           lead + (P_PILOT, 2)))
    return jnp.concatenate(pieces, axis=-2)


def deframe(pl: jnp.ndarray, modcod: str) -> jnp.ndarray:
    """(F, pl_frame_size, 2) -> (F, N_xfec, 2): strip PLH + pilots.

    Pilots recur with a fixed period (16 slots + one pilot block), so all
    full periods drop their pilot via ONE strided reshape-slice; only the
    trailing partial segment needs a concatenate.  The segment-per-pilot
    concat form cost ~12 ms at bench geometry vs ~2 ms for this
    (tools/probe_decode.py; equality on all 5 MODCODs pinned in
    tests/test_framer.py)."""
    cfg = Config(modcod=modcod)
    n_p, per = cfg.n_pilots, 16 * M_SLOT + P_PILOT
    lead = pl.shape[:-2]
    body = pl[..., M_SLOT:, :]
    head = body[..., :n_p * per, :] \
        .reshape(lead + (n_p, per, 2))[..., :16 * M_SLOT, :]
    return jnp.concatenate(
        [head.reshape(lead + (n_p * 16 * M_SLOT, 2)),
         body[..., n_p * per:, :]], axis=-2)
