"""Full-chain Monte-Carlo (filters + synchronization) — the `dvbs2_tx_rx`
equivalent (reference: src/mains/TX_RX/main.cpp).

    python -m dvbs2_tpu.mains.tx_rx --chn-max-delay 4.5 -m 3.2 -M 3.9
"""
import time

import jax
import jax.numpy as jnp

from dvbs2_tpu import cli
from dvbs2_tpu.chains import txrx
from dvbs2_tpu.harness import montecarlo


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.tx_rx")
    p.add_argument("--streams", type=int, default=8,
                   help="parallel independent sample streams (lane batch)")
    p.add_argument("--frames-per-step", type=int, default=8)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    cli.print_trace(cfg, "tx_rx", section=args.section)
    montecarlo.install_signal_handler()   # clean Ctrl-C (Signal_handler analogue)

    B, F = args.streams, args.frames_per_step
    step = txrx.jit_step(cfg, B, F)
    print(montecarlo.format_header())
    ebn0 = cfg.ebn0_min
    while ebn0 < cfg.ebn0_max:
        esn0 = cfg.ebn0_to_esn0(ebn0)
        sigma = jnp.float32(cfg.esn0_to_sigma(esn0))
        state = txrx.txrx_init(cfg, B)
        key = jax.random.fold_in(jax.random.key(args.seed), int(ebn0 * 100))
        if not cfg.perfect_sync and not args.no_wl_phases:
            trace = [] if args.stats_path else None
            state = txrx.acquire(jax.random.fold_in(key, 2**31 - 1), sigma,
                                 cfg, state, B, verbose=True, trace=trace)
            if trace is not None:
                # per-phase probe dump, one file per SNR point like the
                # reference's stats_sigma_* Terminal_dump files
                # (TX_RX/main.cpp:433-453)
                path = f"{args.stats_path}_ebn0_{ebn0:.2f}.txt"
                with open(path, "w") as fh:
                    fh.write("#     PHASE |  FRA |  FSYNC_MIN |     NU_MEAN"
                             " | SLIPS\n")
                    for (ph, i, met, nu, sl) in trace:
                        fh.write(f"# {ph:>10s} | {i:4d} | {met:10.2f} |"
                                 f" {nu:11.6f} | {sl:5d}\n")
        be = fe = fra = 0
        t0 = time.perf_counter()
        i = 0
        while fe < cfg.max_fe and fra < args.max_frames:
            r = step(jax.random.fold_in(key, i), sigma, state)
            state = r.state
            be += int(r.be); fe += int(r.fe); fra += int(r.n_frames)
            i += 1
        pt = montecarlo.SnrPoint(ebn0=ebn0, esn0=esn0, n_frames=fra, be=be,
                                 fe=fe, elapsed_s=time.perf_counter() - t0,
                                 K_info=cfg.K_bch)
        print(montecarlo.format_row(pt))
        ebn0 = round(ebn0 + cfg.ebn0_step, 10)
    print("#\n# End of the simulation")


if __name__ == "__main__":
    main()
