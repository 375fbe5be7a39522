#!/usr/bin/env python
"""Empirically resolve the bit-interleaver convention against refs/TX_RX_BB.

The aff3ct Interleaver_core_column_row + Modem_generic bit-order composite is
not directly readable (empty submodule); four self-consistent conventions
exist: {write-col/read-row, its transpose} x {natural, reversed column
order}.  QPSK is insensitive (both bits of a Gray QPSK symbol have equal
reliability); 8PSK/16APSK FER discriminates sharply.  This probe measures
one steep-SNR ref point per higher-order MODCOD under each convention.

Usage: python tools/itl_probe.py [--target-fe 150]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.ops import interleaver

POINTS = [
    ("8PSK-S_3/5", "DVBS2", 2.9, 2.30e-2, 103),
    ("8PSK-S_8/9", "DVBS2", 6.4, 3.10e-2, 110),
    ("16APSK-S_8/9", "PERFECT", 7.4, 1.16e-2, 111),
]


def perm(n: int, n_cols: int, read_order: str, transposed: bool) -> np.ndarray:
    rows = n // n_cols
    cols = np.arange(n_cols)
    if read_order == "TOP_RIGHT":
        cols = cols[::-1]
    pi = (cols[None, :] * rows + np.arange(rows)[:, None]).reshape(-1)
    if transposed:
        inv = np.empty_like(pi)
        inv[pi] = np.arange(n)
        pi = inv
    return pi.astype(np.int32)


def patch(variant: str):
    flip = variant in ("flip", "trflip")
    transposed = variant in ("tr", "trflip")

    def eff(ro):
        if flip:
            return "TOP_LEFT" if ro == "TOP_RIGHT" else "TOP_RIGHT"
        return ro

    def itl(bits, n_cols, read_order):
        if n_cols == 1:
            return bits
        p = jnp.asarray(perm(bits.shape[-1], n_cols, eff(read_order),
                             transposed))
        return jnp.take(bits, p, axis=-1)

    def deitl(llrs, n_cols, read_order):
        if n_cols == 1:
            return llrs
        p = perm(llrs.shape[-1], n_cols, eff(read_order), transposed)
        inv = np.empty_like(p)
        inv[p] = np.arange(len(p))
        return jnp.take(llrs, jnp.asarray(inv), axis=-1)

    interleaver.interleave = itl
    interleaver.deinterleave = deitl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-fe", type=int, default=150)
    ap.add_argument("--variants", default="cur,flip,tr,trflip")
    ap.add_argument("--out", default="itl_probe.json")
    args = ap.parse_args()

    sys.modules.pop("tools.parity_sweep", None)
    from tools.parity_sweep import make_step, measure_fer  # noqa

    out = {}
    for variant in args.variants.split(","):
        patch(variant)
        print(f"== variant {variant}", flush=True)
        res = {}
        for (modcod, est, ebn0, fer_ref, fe_ref) in POINTS:
            cfg = Config(modcod=modcod, ldpc_implem="SPA", ldpc_nite=50,
                         est_type=est)
            fe, fr, _ = measure_fer(cfg, ebn0, target_fe=args.target_fe,
                                    seed_base=zlib.crc32(
                                        variant.encode()) % 1000)
            fer = fe / max(fr, 1)
            s = math.sqrt(1 / max(fe, 1) + 1 / fe_ref)
            z = math.log(max(fer, 1e-12) / fer_ref) / s
            res[modcod] = {"ebn0": ebn0, "fer": fer, "fer_ref": fer_ref,
                           "ratio": fer / fer_ref, "z": z}
            print(f"    {modcod}: ratio={fer/fer_ref:.3f} z={z:+.2f}",
                  flush=True)
        out[variant] = res
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
