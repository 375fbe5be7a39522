"""Baseband Monte-Carlo BER/FER simulation — the `dvbs2_tx_rx_bb` equivalent
(reference: src/mains/TX_RX_BB/main.cpp). Usage mirrors the reference CLI:

    python -m dvbs2_tpu.mains.tx_rx_bb -m 3.60 -M 3.81 [--dec-implem NMS ...]
"""
import sys

from dvbs2_tpu import cli
from dvbs2_tpu.harness import montecarlo


def main(argv=None):
    args = cli.build_parser("dvbs2_tpu.tx_rx_bb").parse_args(argv)
    cfg = cli.config_from_args(args)
    cli.print_trace(cfg, "tx_rx_bb", section=args.section)
    montecarlo.install_signal_handler()   # clean Ctrl-C (Signal_handler analogue)
    if args.sim_dbg:
        from dvbs2_tpu.harness import stats
        stats.run_debug(cfg, batch=2, ebn0=args.sim_noise_min,
                        limit=args.sim_dbg_limit)
    step_fn = None
    if args.src_type != "RAND":
        import jax
        import jax.numpy as jnp
        from dvbs2_tpu.chains import txrx_bb
        from dvbs2_tpu.io.sources import build_source
        src = build_source(args.src_type, cfg.K_bch, args.src_path,
                           loop=not args.src_no_loop)
        jf = jax.jit(lambda bits, key, sigma:
                     txrx_bb.txrx_bb_step_bits(bits, key, sigma, cfg))
        step_fn = lambda key, sigma: jf(
            jnp.asarray(src.next_batch(args.sim_inter_fra)), key, sigma)
    montecarlo.sweep(cfg, batch=args.sim_inter_fra, seed=args.seed,
                     max_frames=args.max_frames, step_fn=step_fn)
    if args.sim_stats:
        from dvbs2_tpu.harness import stats
        stats.run_stats(cfg, batch=args.sim_inter_fra,
                        ebn0=args.sim_noise_min)
    print("#")
    print("# End of the simulation")


if __name__ == "__main__":
    main()
