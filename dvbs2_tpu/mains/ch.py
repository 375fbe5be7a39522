"""File channel — the `dvbs2_ch` equivalent (reference: src/mains/CH/
main.cpp): read IQs, apply impairments + noise, write IQs.

    python -m dvbs2_tpu.mains.ch --rad-rx-file-path in.bin \
        --rad-tx-file-path out.bin -m 4.0 --chn-max-delay 4.5
"""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.io.radio import EndOfStream, FileRadio


def main(argv=None):
    args = cli.build_parser("dvbs2_tpu.ch").parse_args(argv)
    cfg = cli.config_from_args(args)
    rx = FileRadio(args.rad_rx_file_path, "r", loop=not args.rad_rx_no_loop)
    tx = FileRadio(args.rad_tx_file_path, "w")
    sigma = cfg.ebn0_to_sigma(args.sim_noise_min)
    n = cfg.rad_frame_size
    state = None
    key = jax.random.key(args.seed)
    i = 0
    try:
        while True:
            block = rx.receive(n)
            y, state = channel_chain.apply(
                jax.random.fold_in(key, i), jnp.asarray(block)[None],
                sigma, cfg, state)
            tx.send(np.asarray(y[0]))
            i += 1
            if rx.loop and i * n >= len(rx._data):
                break
    except EndOfStream:
        pass
    tx.close()
    print(f"# channel processed {i} blocks")


if __name__ == "__main__":
    main()
