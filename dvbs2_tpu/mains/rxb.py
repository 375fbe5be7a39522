"""RX-only throughput benchmark — the `dvbs2_rxb` equivalent (reference:
src/mains/RX/main_bench.cpp: run the receiver forever on prerecorded IQs
and report throughput).

    python -m dvbs2_tpu.mains.rxb --rad-rx-file-path ch.bin --rxb-seconds 10

IQs are read through the native threaded ring-buffer stream
(io/native.NativeStream, the analogue of the reference's dedicated radio
thread + FIFO) when the toolchain is available; the RX chain runs as the
jitted stream step with several batches kept in flight so the remote-TPU
round-trip latency doesn't serialize dispatches.
"""
import time

import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains.rx import rx_frames, rx_init
from dvbs2_tpu.io.radio import open_rx_radio


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.rxb")
    p.add_argument("--rxb-seconds", type=float, default=10.0)
    p.add_argument("--rxb-frames-per-step", type=int, default=8)
    p.add_argument("--acq-learn", type=int, default=150)
    p.add_argument("--acq-learn3", type=int, default=200)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    assert args.rad_rx_file_path, "--rad-rx-file-path required"
    F = args.rxb_frames_per_step
    n = F * cfg.rad_frame_size
    try:
        from dvbs2_tpu.io.native import NativeStream
        stream = NativeStream(args.rad_rx_file_path, loop=True)
        recv_n = stream.read
        native = True
    except Exception:
        radio = open_rx_radio(args)
        recv_n = radio.receive
        native = False
    recv = lambda: recv_n(n)
    sigma = cfg.ebn0_to_sigma(args.sim_noise_min)
    if cfg.perfect_sync or args.no_wl_phases:
        state = rx_init(cfg, 1)
    else:
        from dvbs2_tpu.chains.acquisition import acquire_stream
        state = acquire_stream(
            lambda m: jnp.asarray(recv_n(m))[None], cfg,
            learn12=args.acq_learn, learn3=args.acq_learn3)

    # warm-up / compile
    bits, _info, state = rx_frames(jnp.asarray(recv())[None], sigma, cfg,
                                   state, F)
    _ = np.asarray(bits)

    done = 0
    pending = []
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.rxb_seconds:
        bits, _info, state = rx_frames(jnp.asarray(recv())[None], sigma,
                                       cfg, state, F)
        pending.append(bits)
        done += F
        if len(pending) > 4:
            _ = np.asarray(pending.pop(0))[0, 0, 0]
    for b in pending:
        _ = np.asarray(b)[0, 0, 0]
    dt = time.perf_counter() - t0
    fps = done / dt
    mbps = fps * cfg.K_bch / 1e6
    print(f"# RX benchmark ({'native stream' if native else 'file'} input, "
          f"{cfg.modcod}, {cfg.ldpc_implem}-{cfg.ldpc_nite})")
    print(f"#   frames: {done}  elapsed: {dt:.2f}s  ->  {fps:.1f} frames/s, "
          f"{mbps:.1f} Mb/s info throughput")


if __name__ == "__main__":
    main()
