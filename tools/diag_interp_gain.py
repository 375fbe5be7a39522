#!/usr/bin/env python
"""Pure-numpy demonstration of the fractional-interpolation SNR effect that
makes the full chain measure BETTER FER than the reference's refs/TX_RX.

Chain: QPSK -> RRC(osf=2, unit energy) -> [channel PP fractional delay] ->
AWGN(sigma for Eb/N0 3.5) -> RRC matched filter -> piecewise-parabolic
interpolation at the symbol instants -> strobed Es/N0 against the known
symbols.

After the matched filter the NOISE PSD is shaped |H_rrc|^2 (raised cosine)
while the SIGNAL PSD is |H_rrc|^4 (RC squared) — the noise keeps more
excess-band energy than the signal.  The reference's own Farrow
interpolator (Filter_Farrow_ccr_naive.hxx set_mu — identical coefficients
to ops/filters.farrow_taps) is a mild lowpass at mu=0.5, so sampling at the
half-sample timing point attenuates that excess noise more than the signal:
a REAL ~+0.39 dB effective Es/N0 gain (including the interpolator's ISI
penalty), vs ~+0.05 dB at mu=0.

Measured output (seeded):
    mu=0.0: Es/N0 = 6.00 dB   (true 5.948)
    mu=0.5: Es/N0 = 6.34 dB

This bounds how much of the measured full-chain FER advantage over
refs/TX_RX (parity_full.json, delay-4.5 configs) is interpolation physics;
the remainder is lock quality (our lockstep scans track with essentially
no self-noise, while the reference's receiver measures ~0.1-0.15 dB worse
than its own BB chain).
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dvbs2_tpu.ops.filters import rrc_taps  # noqa: E402


def pp(mu):
    hm, hs = 0.5 * mu, 0.5 * mu * mu
    return np.array([hs - hm, 1 - hm - hs, mu + hm - hs, hs - hm])


def conv2(a, b):
    return np.stack([np.convolve(a[:, 0], b), np.convolve(a[:, 1], b)], -1)


def main():
    rng = np.random.RandomState(0)
    h = rrc_taps(0.2, 2, 20).astype(np.float64)
    Nsym = 40000
    s = (1 - 2 * rng.randint(0, 2, (Nsym, 2))) / np.sqrt(2)
    x = np.zeros((2 * Nsym, 2))
    x[::2] = s
    tx = conv2(x, h)
    sigma = 0.3565                      # Eb/N0 3.5 dB at QPSK-S_8/9
    for frac in (0.0, 0.5):
        ch = np.vstack([np.zeros((4, 2)), conv2(tx, pp(frac))])
        y = ch + sigma * rng.randn(*ch.shape)
        z = conv2(conv2(y, h), pp((1 - frac) % 1.0))
        best = None
        for off in range(70, 110):
            sym = z[off:off + 2 * (Nsym - 300):2]
            ref = s[:len(sym)]
            g = (sym * ref).sum() / (ref ** 2).sum()
            res = sym - g * ref
            esn0 = 10 * np.log10((g ** 2) * (ref ** 2).sum(-1).mean()
                                 / (res ** 2).sum(-1).mean())
            if best is None or esn0 > best:
                best = esn0
        print(f"mu={frac}: strobed Es/N0 = {best:.3f} dB (true "
              f"{10 * np.log10(1 / (2 * sigma ** 2)):.3f})")


if __name__ == "__main__":
    main()
