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
    cli.print_trace(cfg, "tx_rx_bb")
    montecarlo.sweep(cfg, batch=args.sim_inter_fra, seed=args.seed,
                     max_frames=args.max_frames)
    print("#")
    print("# End of the simulation")


if __name__ == "__main__":
    main()
