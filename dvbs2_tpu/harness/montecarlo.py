"""Monte-Carlo BER/FER harness — equivalent of the reference's SNR sweep +
Monitor_BFER(+reduction) + Terminal (reference: src/mains/TX_RX_BB/
main.cpp:139-186; monitor semantics from aff3ct Monitor_BFER: frame error =
any bit error, stop at max_fe frame errors).

The host loop only decides *how many more batches* to run; all compute is in
the jitted step. Batches overshoot the stop criterion exactly like the
reference's multi-threaded monitors do (compare FE=164 > 100 in
refs/TX_RX_BB/QPSK_8_9.txt row 1).
"""
from __future__ import annotations

import dataclasses
import signal
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config


@dataclasses.dataclass
class SnrPoint:
    ebn0: float
    esn0: float
    n_frames: int
    be: int
    fe: int
    elapsed_s: float
    K_info: int
    esn0_est_sum: float = 0.0   # Reporter_noise_DVBS2 estimated-SNR column

    @property
    def esn0_est(self) -> float:
        return self.esn0_est_sum / max(self.n_frames, 1)

    @property
    def ber(self) -> float:
        return self.be / max(self.n_frames * self.K_info, 1)

    @property
    def fer(self) -> float:
        return self.fe / max(self.n_frames, 1)

    @property
    def sim_thr_mbps(self) -> float:
        """Info throughput of the whole sim (the reference's SIM_THR column)."""
        return self.n_frames * self.K_info / max(self.elapsed_s, 1e-12) / 1e6


# Clean Ctrl-C: the reference installs spu::tools::Signal_handler so a
# SIGINT finishes the current iteration and still prints the final report
# (TX_RX_BB/main.cpp:31, terminal final_report).  Here the first SIGINT
# raises a flag checked between dispatches (the in-flight batches drain and
# the partial point/table is returned/printed); a second SIGINT falls back
# to the default handler (hard exit).
_interrupted = False


def _on_sigint(signum, frame):
    global _interrupted
    _interrupted = True
    signal.signal(signal.SIGINT, signal.SIG_DFL)
    print("# SIGINT: finishing current point (Ctrl-C again to force quit)",
          flush=True)


def install_signal_handler():
    """Install the reference-style graceful SIGINT handler (call from
    mains; returns the previous handler)."""
    return signal.signal(signal.SIGINT, _on_sigint)


def interrupted() -> bool:
    return _interrupted


def run_snr_point(step_fn: Callable, cfg: Config, ebn0: float, batch: int,
                  max_fe: Optional[int] = None, max_frames: int = 10_000_000,
                  min_frames: int = 0, seed: int = 0, in_flight: int = 4,
                  verbose: bool = False) -> SnrPoint:
    """Run batches of ``step_fn(key, sigma)`` until max_fe frame errors.

    Several batches stay in flight before the first result is fetched —
    on the remote-TPU transport each scalar fetch costs a full round trip,
    so the dispatch pipeline (not host latency) sets the throughput."""
    max_fe = cfg.max_fe if max_fe is None else max_fe
    esn0 = cfg.ebn0_to_esn0(ebn0)
    sigma = jnp.float32(cfg.esn0_to_sigma(esn0))
    key = jax.random.key(seed)
    be = fe = fra = 0
    est_sum = 0.0
    t0 = time.perf_counter()
    i = 0
    pending = []

    def drain_one():
        nonlocal be, fe, fra, est_sum
        r = pending.pop(0)
        be += int(r.be)
        fe += int(r.fe)
        fra += int(r.n_frames)
        est_sum += float(getattr(r, "esn0_est_sum", 0.0))

    while not _interrupted and (
            (fe < max_fe and fra + len(pending) * batch < max_frames)
            or fra + len(pending) * batch < min_frames):
        pending.append(step_fn(jax.random.fold_in(key, i), sigma))
        i += 1
        if len(pending) >= in_flight:
            drain_one()
        if verbose and i % 50 == 0:
            print(f"  ebn0={ebn0:.2f} fra={fra} fe={fe} "
                  f"ber={be/max(fra*cfg.K_bch,1):.3e}")
    while pending:
        drain_one()
    elapsed = time.perf_counter() - t0
    return SnrPoint(ebn0=ebn0, esn0=esn0, n_frames=fra, be=be, fe=fe,
                    elapsed_s=elapsed, K_info=cfg.K_bch, esn0_est_sum=est_sum)


def format_header() -> str:
    """aff3ct-style table; 'Es/N0 est' is the Reporter_noise_DVBS2 blind
    estimate column (reference: Reporter_noise_DVBS2.cpp:15-80)."""
    return ("# ----------|----------|----------||----------|----------|----------|----------|----------||----------\n"
            "# Es/N0 est |    Es/N0 |    Eb/N0 ||      FRA |       BE |       FE |      BER |      FER ||  SIM_THR\n"
            "#      (dB) |     (dB) |     (dB) ||          |          |          |          |          ||   (Mb/s)")


def format_row(p: SnrPoint) -> str:
    return (f"  {p.esn0_est:9.2f} | {p.esn0:8.2f} | {p.ebn0:8.2f} || "
            f"{p.n_frames:8d} | {p.be:8d} | "
            f"{p.fe:8d} | {p.ber:.2e} | {p.fer:.2e} || {p.sim_thr_mbps:8.3f}")


def sweep(cfg: Config, batch: int = 32, seed: int = 0,
          step_fn: Optional[Callable] = None, verbose: bool = True,
          max_frames: int = 10_000_000) -> list:
    """Full Eb/N0 sweep like the reference main (TX_RX_BB/main.cpp:139-186)."""
    from dvbs2_tpu.chains.txrx_bb import jit_step
    fn = step_fn or jit_step(cfg, batch)
    points = []
    if verbose:
        print(format_header())
    ebn0 = cfg.ebn0_min
    while ebn0 < cfg.ebn0_max:
        p = run_snr_point(fn, cfg, ebn0, batch, seed=seed,
                          max_frames=max_frames)
        points.append(p)
        if verbose:
            print(format_row(p))
        if _interrupted:
            if verbose:
                print("# End of the simulation (SIGINT)")
            break
        ebn0 = round(ebn0 + cfg.ebn0_step, 10)
    return points
