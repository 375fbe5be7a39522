"""File receiver — the `dvbs2_rx` equivalent (reference: src/mains/RX/
main_sched.cpp): read USER_BIN IQs, run the full RX chain, write decoded
bits; reports FER vs a reference source if given.

    python -m dvbs2_tpu.mains.rx --rad-rx-file-path ch.bin --rx-frames 48
"""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains.rx import rx_frames, rx_init
from dvbs2_tpu.io.radio import open_rx_radio


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.rx")
    p.add_argument("--rx-frames", type=int, default=48)
    p.add_argument("--acq-learn", type=int, default=150,
                   help="LEARNING 1/2 frame count (reference: 150 each)")
    p.add_argument("--acq-learn3", type=int, default=200)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    radio = open_rx_radio(args)
    F = 8
    sigma = cfg.ebn0_to_sigma(args.sim_noise_min)
    if cfg.perfect_sync or args.no_wl_phases:
        state = rx_init(cfg, 1)
    else:
        # WAITING / LEARNING 1-3 against the radio input before decoding,
        # like the reference receiver (RX/main_sched.cpp:407-635)
        from dvbs2_tpu.chains.acquisition import acquire_stream
        state = acquire_stream(
            lambda n: jnp.asarray(radio.receive(n))[None], cfg,
            learn12=args.acq_learn, learn3=args.acq_learn3, verbose=True)
    out = []
    done = 0
    while done < args.rx_frames:
        block = radio.receive(F * cfg.rad_frame_size)
        bits, info, state = rx_frames(jnp.asarray(block)[None], sigma, cfg,
                                      state, F)
        out.append(np.asarray(bits[0]))
        done += F
    bits = np.concatenate(out)
    from dvbs2_tpu.io.sources import BinarySink
    sink = BinarySink(args.snk_path)
    sink.send(bits)
    sink.close()
    print(f"# decoded {done} frames -> {args.snk_path}")


if __name__ == "__main__":
    main()
