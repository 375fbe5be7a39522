#!/usr/bin/env python
"""Protograph EXIT (density-evolution) threshold prediction for the
reconstructed DVB-S2 LDPC tables under the QPSK and column-interleaved
8PSK/16APSK bit channels.

Purpose (round-4, VERDICT item 4): turn round 3's *attribution* of the
8PSK BB FER offset ("irreducible within the reconstruction ensemble")
into a *prediction*: compute decoding thresholds for the frozen
reconstruction and the v4 degree-profile variants under both channels,
and check the predicted (QPSK, 8PSK) threshold frontier against the
measured FER orderings (ldpc_profile_3_5_strong.json, parity_spa50.json)
— in particular whether ANY same-ensemble profile can close the ~0.06 dB
8PSK deficit while holding QPSK parity.

Method: exact protograph over the frozen table's lifted structure —
q check classes (address residues mod q), one variable class per
360-column info group, parity accumulator classes split by interleaver
third — with Gaussian-approximation MI evolution (PEXIT, Liva-Chiani
style; J-function per Brannstrom et al.).  Channel MI per codeword
position class comes from the actual bit-channel of the mapped
constellation (Monte-Carlo, exact max-star LLRs), with the column-row
interleaver mapping codeword thirds/quarters to constellation bit
positions (TOP_LEFT: third c -> LSB-first bit c; TOP_RIGHT reversed —
reference: DVBS2.cpp:451-476; bit order ops/modem.py).

Writes pexit_<rate>.json.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dvbs2_tpu.data.constellations import get_constellation
from dvbs2_tpu.data import ldpc_tables

N = 16200
GROUP = 360

# Brannstrom J-function approximation (public EXIT-chart literature)
_H1, _H2, _H3 = 0.3073, 0.8935, 1.1064


def J(sigma):
    sigma = np.maximum(sigma, 1e-12)
    return np.clip((1.0 - 2.0 ** (-_H1 * sigma ** (2 * _H2))) ** _H3,
                   0.0, 1.0 - 1e-12)


def J_inv(I):
    I = np.clip(I, 1e-12, 1.0 - 1e-12)
    return ((-1.0 / _H1) * np.log2(1.0 - I ** (1.0 / _H3))) ** (1.0 / (2 * _H2))


# ---------------------------------------------------------------------------
# bit-channel mutual information (Monte Carlo, exact LLRs)
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def _bit_channel_mi_cached(mod: str, esn0_mdb: int, n_mc: int) -> tuple:
    return tuple(bit_channel_mi(mod, esn0_mdb / 1000.0, n_mc=n_mc))


def bit_channel_mi_q(mod: str, esn0_db: float, n_mc: int) -> np.ndarray:
    """Cached MI lookup with Es/N0 quantized to 1e-3 dB (bisection points
    repeat across variants)."""
    return np.array(_bit_channel_mi_cached(mod, int(round(esn0_db * 1000)),
                                           n_mc))


def bit_channel_mi(mod: str, esn0_db: float, n_mc: int = 200_000,
                   seed: int = 0) -> np.ndarray:
    """(bps,) MI of each constellation bit channel (LSB first) at Es/N0.

    sigma convention matches the chain: per-real-dimension noise std
    sigma = sqrt(1/(2*10^(esn0/10))) for unit-energy constellations."""
    cstl = get_constellation(mod).astype(np.complex128)
    bps = int(np.log2(len(cstl)))
    sigma = math.sqrt(1.0 / (2.0 * 10.0 ** (esn0_db / 10.0)))
    rng = np.random.RandomState(seed + int(esn0_db * 1000) % 99991)
    idx = rng.randint(0, len(cstl), n_mc)
    y = cstl[idx] + sigma * (rng.randn(n_mc) + 1j * rng.randn(n_mc))
    # metric[n, c] = -|y_n - cstl_c|^2 / (2 sigma^2)
    d2 = np.abs(y[:, None] - cstl[None, :]) ** 2
    metric = -d2 / (2.0 * sigma * sigma)
    mis = np.empty(bps)
    for k in range(bps):
        mask = ((np.arange(len(cstl)) >> k) & 1).astype(bool)
        m0 = np.where(~mask[None, :], metric, -np.inf)
        m1 = np.where(mask[None, :], metric, -np.inf)
        lse = lambda m: np.logaddexp.reduce(m, axis=1)
        llr = lse(m0) - lse(m1)                       # log P0 - log P1
        b = mask[idx].astype(np.float64)              # transmitted bit
        # I = 1 - E[log2(1 + exp(-(1-2b) LLR))]
        x = np.clip(-(1.0 - 2.0 * b) * llr, -60, 60)
        mis[k] = 1.0 - np.mean(np.log2(1.0 + np.exp(x)))
    return np.clip(mis, 1e-9, 1 - 1e-9)


# ---------------------------------------------------------------------------
# protograph construction from a frozen table
# ---------------------------------------------------------------------------

def build_protograph(rate_spec: str, channel: str):
    """-> (Bv (n_vc, q) edge counts, ch_class (n_vc,) channel-position
    class id, frac (n_vc,) variable fraction, labels).

    Variable classes: one per info group (360 bits each) + 2*q parity
    classes (each accumulator residue split into the two interleaver
    thirds it occupies).  channel class = which constellation bit (or
    'uniform' for QPSK) its positions map to under the column-row
    interleaver with the MODCOD's read order.
    """
    tab = ldpc_tables.get_table(rate_spec)
    q, K = tab.q, tab.K
    NmK = N - K
    G = K // GROUP
    if channel == "QPSK":
        n_cols, read_order, bps = 1, "TOP_LEFT", 2
    elif channel.startswith("8PSK"):
        n_cols, bps = 3, 3
        read_order = "TOP_RIGHT" if channel.endswith("TR") else "TOP_LEFT"
    elif channel == "16APSK":
        n_cols, read_order, bps = 4, "TOP_LEFT", 4
    else:
        raise ValueError(channel)
    n_rows = N // n_cols
    cols = list(range(n_cols))
    if read_order == "TOP_RIGHT":
        cols = cols[::-1]
    # codeword position p lives in column c = p // n_rows -> constellation
    # bit k with cols[k] == c (LSB first, ops/modem.py)
    col_to_bit = {c: k for k, c in enumerate(cols)}

    def pos_bit(p):
        if n_cols == 1:
            return 0
        return col_to_bit[p // n_rows]

    Bv, chc, size, labels = [], [], [], []
    # info groups (contiguous 360-bit spans; GROUP divides n_rows slack —
    # a group may straddle a column boundary only if 360 does not divide
    # n_rows; n_rows = 5400/4050 are multiples of 360/... handle exactly
    # by splitting any straddling group)
    for g in range(G):
        row = tab.rows[g]
        counts = np.zeros(q)
        for a in row:
            counts[a % q] += 1
        p0, p1 = g * GROUP, (g + 1) * GROUP
        # split by column boundary if straddling
        bounds = sorted({p0, p1, *[c * n_rows for c in range(1, n_cols)
                                   if p0 < c * n_rows < p1]})
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            Bv.append(counts)
            chc.append(pos_bit(lo))
            size.append(hi - lo)
            labels.append(f"info{g}" + ("" if hi - lo == GROUP else f"@{lo}"))
    # parity classes: residue r, split by interleaver third of position
    # K + p (p = 0..NmK-1, p ≡ r mod q, positions spread evenly)
    for r in range(q):
        ps = np.arange(r, NmK, q)
        bits = np.array([pos_bit(K + p) for p in ps])
        for k in sorted(set(bits)):
            sel = bits == k
            counts = np.zeros(q)
            counts[r] += 1.0                    # check p (class r)
            counts[(r + 1) % q] += 1.0          # check p+1 (class r+1)
            Bv.append(counts)
            chc.append(k)
            size.append(int(sel.sum()))
            labels.append(f"par{r}b{k}")
    return np.array(Bv), np.array(chc), np.array(size, float), labels, q


def pexit_converges(Bv, chc, size, sigma_ch_bits, q, max_iter=1000,
                    target=0.9999) -> bool:
    """Run PEXIT; True if APP MI of every variable class reaches target."""
    n_vc = Bv.shape[0]
    sig_ch = sigma_ch_bits[chc]                       # (n_vc,)
    I_av = np.zeros((n_vc, q))                        # var -> check MI
    # check-side edge counts scale with variable-class size: each check
    # class has 360 members, so Bc[j][i] = Bv[i][j] * size_i / 360
    # (fractional for the parity subclasses split by interleaver third)
    Bc = Bv * (size[:, None] / 360.0)                 # (n_vc, q)
    active = Bv > 0
    for _ in range(max_iter):
        # check -> var
        t_c = J_inv(1.0 - np.where(active, I_av, 0.0)) ** 2 * Bc  # (n_vc,q)
        # per check class j: sum over i of Bv[i,j]*Jinv(1-Iav[i,j])^2
        tot_c = t_c.sum(axis=0)                       # (q,)
        I_ac = np.where(
            active,
            1.0 - J(np.sqrt(np.maximum(
                tot_c[None, :] - J_inv(1.0 - I_av) ** 2, 0.0))),
            0.0)
        # var -> check
        t_v = np.where(active, J_inv(I_ac) ** 2 * Bv, 0.0)
        tot_v = t_v.sum(axis=1)                       # (n_vc,)
        I_av_new = np.where(
            active,
            J(np.sqrt(np.maximum(
                tot_v[:, None] - J_inv(I_ac) ** 2, 0.0)
                + sig_ch[:, None] ** 2)),
            0.0)
        if np.allclose(I_av_new, I_av, atol=1e-8):
            I_av = I_av_new
            break
        I_av = I_av_new
    I_app = J(np.sqrt(tot_v + sig_ch ** 2))
    return bool(np.all(I_app >= target))


def threshold(rate_spec: str, channel: str, mod: str,
              lo: float = -2.0, hi: float = 16.0, tol: float = 0.005,
              n_mc: int = 200_000):
    """Bisect the Es/N0 (dB) PEXIT convergence threshold."""
    Bv, chc, size, labels, q = build_protograph(rate_spec, channel)

    def ok(esn0):
        mis = bit_channel_mi_q(mod, esn0, n_mc)
        if channel == "QPSK":
            sig = np.array([J_inv(mis.mean())])
        else:
            sig = J_inv(mis)
        return pexit_converges(Bv, chc, size, sig, q)

    if not ok(hi):
        return float("nan")
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if ok(mid):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# ensemble-average profile sweep: can ANY same-ensemble degree profile
# close the 8PSK deficit while holding QPSK parity?
# ---------------------------------------------------------------------------

def synth_protograph(degrees: list, rate: str, channel: str):
    """Ensemble-average protograph for a hypothetical degree profile
    (uniform residues: Bv[g][r] = d_g/q — the construction balances
    residues, data/ldpc_construct.py)."""
    K, q, _ = ldpc_tables._GEOM[rate]
    NmK = N - K
    G = K // GROUP
    assert len(degrees) == G
    if channel == "QPSK":
        n_cols = 1
        cols = [0]
    else:
        n_cols = 3
        cols = [2, 1, 0] if channel.endswith("TR") else [0, 1, 2]
    n_rows = N // n_cols
    col_to_bit = {c: k for k, c in enumerate(cols)}

    def pos_bit(p):
        return 0 if n_cols == 1 else col_to_bit[p // n_rows]

    Bv, chc, size = [], [], []
    for g in range(G):
        p0, p1 = g * GROUP, (g + 1) * GROUP
        bounds = sorted({p0, p1, *[c * n_rows for c in range(1, n_cols)
                                   if p0 < c * n_rows < p1]})
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            Bv.append(np.full(q, degrees[g] / q))
            chc.append(pos_bit(lo))
            size.append(hi - lo)
    for r in range(q):
        ps = np.arange(r, NmK, q)
        bits = np.array([pos_bit(K + p) for p in ps])
        for k in sorted(set(bits)):
            counts = np.zeros(q)
            counts[r] += 1.0
            counts[(r + 1) % q] += 1.0
            Bv.append(counts)
            chc.append(k)
            size.append(int((bits == k).sum()))
    return (np.array(Bv), np.array(chc), np.array(size, float), q)


def synth_threshold(degrees: tuple, rate: str, channel: str, mod: str,
                    n_mc: int, lo=-2.0, hi=16.0, tol=0.01):
    Bv, chc, size, q = synth_protograph(list(degrees), rate, channel)

    def ok(esn0):
        mis = bit_channel_mi_q(mod, esn0, n_mc)
        sig = (np.array([J_inv(mis.mean())]) if channel == "QPSK"
               else J_inv(mis))
        return pexit_converges(Bv, chc, size, sig, q)

    if not ok(hi):
        return float("nan")
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if ok(mid):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


def profile_sweep(rate: str, ch8: str, mod8: str, n_mc: int):
    """DE-only sweep over constructible degree profiles (n_hi groups of
    degree d_hi, the rest degree d_lo, high-degree groups first — the
    ensemble's placement axis is DE-invariant at 3/5 because the info
    thirds land on the two equal-MI Gray bits).  Returns the frontier:
    for each profile, (QPSK thr, 8PSK thr)."""
    K, q, degfn = ldpc_tables._GEOM[rate]
    G = K // GROUP
    out = []
    for d_lo in (3, 4):
        for d_hi in range(d_lo + 1, 16):
            for n_hi in range(1, G):
                degrees = [d_hi] * n_hi + [d_lo] * (G - n_hi)
                if sum(degrees) % q:
                    continue            # not residue-balanced/constructible
                if sum(degrees) > 14 * G:
                    continue            # cap edge count (decoder cost)
                tq = synth_threshold(tuple(degrees), rate, "QPSK", "QPSK",
                                     n_mc)
                t8 = synth_threshold(tuple(degrees), rate, ch8, mod8, n_mc)
                out.append({"n_hi": n_hi, "d_hi": d_hi, "d_lo": d_lo,
                            "esn0_thr_qpsk": round(tq, 3),
                            "esn0_thr_8psk": round(t8, 3),
                            "delta": round(t8 - tq, 3)})
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rate", default="3/5")
    p.add_argument("--variants", default=None,
                   help="comma list of table specs (default: frozen + v4*)")
    p.add_argument("--n-mc", type=int, default=200_000)
    p.add_argument("--sweep", action="store_true",
                   help="add the DE-only ensemble-average profile sweep "
                        "(the 'can ANY profile close it' frontier)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    rate = args.rate
    if args.variants:
        specs = [v for v in args.variants.split(",")]
    else:
        frozen = ldpc_tables.DEFAULT_VARIANT[rate]
        specs = [f"{rate}@{frozen}"]
        specs += [f"{rate}@v4{prof}s1"
                  for prof in sorted(ldpc_tables.PROFILES[rate])]
    if rate == "3/5":
        ch8, mod8 = "8PSK-TR", "8PSK"
    else:
        ch8, mod8 = "8PSK-TL", "8PSK"
    # overall-rate Es/N0 <-> Eb/N0 shift (Config.ebn0_to_esn0)
    kbch = {"3/5": 9552, "8/9": 14232}[rate]
    out = {"rate": rate, "channel_8psk": ch8, "n_mc": args.n_mc,
           "note": ("PEXIT thresholds in Es/N0 dB (bisection +-0.005); "
                    "ebn0 = esn0 - 10log10(K_bch/N * bps); absolute GA "
                    "accuracy ~0.05-0.1 dB, orderings/deltas are the "
                    "meaningful output"),
           "variants": {}}
    for spec in specs:
        thr_q = threshold(spec, "QPSK", "QPSK", n_mc=args.n_mc)
        thr_8 = threshold(spec, ch8, mod8, n_mc=args.n_mc)
        eb_q = thr_q - 10 * math.log10(kbch / N * 2)
        eb_8 = thr_8 - 10 * math.log10(kbch / N * 3)
        out["variants"][spec] = {
            "esn0_thr_qpsk": round(thr_q, 3),
            "esn0_thr_8psk": round(thr_8, 3),
            "ebn0_thr_qpsk": round(eb_q, 3),
            "ebn0_thr_8psk": round(eb_8, 3),
        }
        if rate == "8/9":
            thr_16 = threshold(spec, "16APSK", "16APSK", n_mc=args.n_mc)
            out["variants"][spec]["esn0_thr_16apsk"] = round(thr_16, 3)
            out["variants"][spec]["ebn0_thr_16apsk"] = round(
                thr_16 - 10 * math.log10(kbch / N * 4), 3)
        print(f"{spec}: " + " ".join(
            f"{k.split('_')[-1]} {v:+.3f}"
            for k, v in out["variants"][spec].items()
            if k.startswith("ebn0")), flush=True)
    if args.sweep:
        sweep = profile_sweep(rate, ch8, mod8, args.n_mc)
        out["profile_sweep"] = sweep
        frozen = out["variants"][specs[0]]
        band = 0.03   # QPSK-parity band in threshold dB (MC-noise scale)
        par = [s for s in sweep
               if abs(s["esn0_thr_qpsk"] - frozen["esn0_thr_qpsk"]) <= band]
        best = min(par, key=lambda s: s["esn0_thr_8psk"], default=None)
        out["sweep_summary"] = {
            "n_profiles": len(sweep),
            "qpsk_parity_band_db": band,
            "n_in_band": len(par),
            "frozen_delta": round(frozen["esn0_thr_8psk"]
                                  - frozen["esn0_thr_qpsk"], 3),
            "best_in_band": best,
            "best_in_band_8psk_gain_db": (
                round(frozen["esn0_thr_8psk"] - best["esn0_thr_8psk"], 3)
                if best else None),
        }
        print(f"sweep: {len(sweep)} profiles, {len(par)} in QPSK-parity "
              f"band; best in-band 8PSK gain vs frozen: "
              f"{out['sweep_summary']['best_in_band_8psk_gain_db']} dB")
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    f"pexit_{rate.replace('/', '_')}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
