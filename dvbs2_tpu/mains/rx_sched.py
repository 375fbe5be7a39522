"""Receiver with automatic scheduling — the `dvbs2_rx_sched` equivalent
(reference: src/mains/RX/main_sched.cpp).

The reference profiles every RX task over P executions, solves an OTAC/GR
pipeline decomposition over R resources, instantiates that pipeline, and
runs the receiver through it.  Here the chain compiles into one fused XLA
program, so the scheduler's role becomes analytic: profile the same task
list, print the optimal pipeline decomposition it WOULD build (exact DP over
contiguous partitions + integer resource allocation), and compare its
predicted throughput against the fused program's measured throughput —
then run the actual receiver exactly like mains/rx.py.

    python -m dvbs2_tpu.mains.rx_sched --rad-rx-file-path ch.bin \
        --sched-r 8 --sched-p 8 --rx-frames 16
"""
import time

import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains.rx import rx_frames, rx_init
from dvbs2_tpu.harness import scheduler, stats
from dvbs2_tpu.io.radio import open_rx_radio


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.rx_sched")
    p.add_argument("--rx-frames", type=int, default=16)
    p.add_argument("--sched-r", "-R", type=int, default=8)
    p.add_argument("--sched-p", "-P", type=int, default=8)
    p.add_argument("--sched-t", "-T", default="OTAC",
                   choices=["OTAC", "GR", "FILE"])
    p.add_argument("--acq-learn", type=int, default=150)
    p.add_argument("--acq-learn3", type=int, default=200)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)

    # --- profile + schedule (Scheduler::profile / ::schedule) ---
    named = scheduler.profile(stats.rx_stages(cfg, batch=8),
                              reps=args.sched_p)

    # --- run the fused receiver (what actually executes) ---
    radio = open_rx_radio(args)
    F = 8
    sigma = cfg.ebn0_to_sigma(args.sim_noise_min)
    if cfg.perfect_sync or args.no_wl_phases:
        state = rx_init(cfg, 1)
    else:
        from dvbs2_tpu.chains.acquisition import acquire_stream
        state = acquire_stream(
            lambda m: jnp.asarray(radio.receive(m))[None], cfg,
            learn12=args.acq_learn, learn3=args.acq_learn3)
    out = []
    done = 0
    t0 = time.perf_counter()
    while done < args.rx_frames:
        block = radio.receive(F * cfg.rad_frame_size)
        bits, _info, state = rx_frames(jnp.asarray(block)[None], sigma, cfg,
                                       state, F)
        out.append(np.asarray(bits[0]))
        done += F
    dt = time.perf_counter() - t0
    scheduler.show(named, R=args.sched_r, fused_thr_fps=done / dt,
                   frames_per_call=8)

    from dvbs2_tpu.io.sources import BinarySink
    sink = BinarySink(args.snk_path)
    sink.send(np.concatenate(out))
    sink.close()
    print(f"# decoded {done} frames -> {args.snk_path}")


if __name__ == "__main__":
    main()
