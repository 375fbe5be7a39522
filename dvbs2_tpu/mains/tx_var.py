"""Variable-SNR transmitter — the `dvbs2_tx_var` equivalent (reference:
src/mains/TX_VAR/main.cpp): TX chain + per-frame fading gain from an Es/N0
schedule file.

    python -m dvbs2_tpu.mains.tx_var --rad-tx-file-path out.bin \
        --fad-path snrs.txt --tx-frames 64
"""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains import tx as txc
from dvbs2_tpu.io.radio import FileRadio
from dvbs2_tpu.ops.filters import fading_gains, read_fading_file


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.tx_var")
    p.add_argument("--tx-frames", type=int, default=64)
    p.add_argument("--fad-path", default=None,
                   help="Es/N0 schedule file: lines of 'esn0 n_frames'")
    p.add_argument("--sim-noise-ref", type=float, default=0.0)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    assert args.rad_tx_file_path, "--rad-tx-file-path required"
    sched = read_fading_file(args.fad_path) if args.fad_path else [(0.0, 1)]
    esn0_ref = cfg.ebn0_to_esn0(args.sim_noise_ref) \
        if args.sim_noise_ref else sched[0][0]
    gains = fading_gains(sched, esn0_ref)
    radio = FileRadio(args.rad_tx_file_path, "w")
    key = jax.random.key(args.seed)
    state = None
    L = cfg.rad_frame_size
    done = 0
    F = 8
    while done < args.tx_frames:
        bits = jax.random.bernoulli(jax.random.fold_in(key, done), 0.5,
                                    (1, F, cfg.K_bch)).astype(jnp.int8)
        wave, state = txc.tx_stream(bits, cfg, state)
        w = np.asarray(wave[0]).reshape(F, L, 2)
        g = gains[(done + np.arange(F)) % len(gains)]
        radio.send((w * g[:, None, None]).reshape(F * L, 2))
        done += F
    radio.close()
    print(f"# wrote {done} frames to {args.rad_tx_file_path}")


if __name__ == "__main__":
    main()
