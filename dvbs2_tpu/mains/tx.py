"""File transmitter — the `dvbs2_tx` equivalent (reference:
src/mains/TX/main.cpp): generate frames, shape, write USER_BIN IQs.

    python -m dvbs2_tpu.mains.tx --rad-tx-file-path out.bin --tx-frames 64
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains import tx as txc
from dvbs2_tpu.io.radio import EndOfStream, open_tx_radio
from dvbs2_tpu.io.sources import build_source


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.tx")
    p.add_argument("--tx-frames", type=int, default=64)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    assert args.rad_tx_file_path or args.rad_type != "USER_BIN", \
        "--rad-tx-file-path required for --rad-type USER_BIN"
    radio = open_tx_radio(args)
    src = build_source(args.src_type, cfg.K_bch, args.src_path,
                       loop=not args.src_no_loop)
    key = jax.random.key(args.seed)
    F = min(args.tx_frames, 16)
    state = None
    done = 0
    t0 = time.perf_counter()
    try:
        while done < args.tx_frames:
            if args.tx_time_limit and time.perf_counter() - t0 > args.tx_time_limit:
                break
            f = min(F, args.tx_frames - done)
            if src is None:
                bits = jax.random.bernoulli(
                    jax.random.fold_in(key, done), 0.5,
                    (1, f, cfg.K_bch)).astype(jnp.int8)
            else:
                bits = jnp.asarray(src.next_batch(f))[None]
            wave, state = txc.tx_stream(bits, cfg, state)
            radio.send(np.asarray(wave[0]))
            done += f
    except EndOfStream:
        pass
    radio.close()
    print(f"# wrote {done} frames to {args.rad_tx_file_path} "
          f"(src {args.src_type})")


if __name__ == "__main__":
    main()
