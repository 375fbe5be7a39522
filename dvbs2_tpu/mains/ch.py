"""File channel — the `dvbs2_ch` equivalent (reference: src/mains/CH/
main.cpp): read IQs, apply --chn-type noise (plus SYNCHRO impairments),
write IQs.

    python -m dvbs2_tpu.mains.ch --rad-rx-file-path in.bin \
        --rad-tx-file-path out.bin -m 4.0 --chn-type SYNCHRO \
        --chn-max-delay 4.5 --chn-max-freq-shift 0.05

--chn-type AWGN (default) adds Gaussian noise only; SYNCHRO prepends
fading -> frame/int/frac delay -> CFO (CH/main.cpp:55-71); USER_ADD adds
noise samples read from --chn-path (DVBS2.cpp:602-604).  Unknown types are
rejected (the reference throws cannot_allocate).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.io.radio import EndOfStream, FileRadio
from dvbs2_tpu.ops.filters import fading_gains, read_fading_file


def main(argv=None):
    args = cli.build_parser("dvbs2_tpu.ch").parse_args(argv)
    cfg = cli.config_from_args(args)
    if cfg.chn_type not in ("AWGN", "SYNCHRO", "USER_ADD"):
        raise SystemExit(f"dvbs2_ch: unknown --chn-type {cfg.chn_type!r}")
    rx = FileRadio(args.rad_rx_file_path, "r", loop=not args.rad_rx_no_loop)
    tx = FileRadio(args.rad_tx_file_path, "w")
    esn0 = cfg.ebn0_to_esn0(args.sim_noise_min)
    sigma = cfg.esn0_to_sigma(esn0)
    n = cfg.rad_frame_size
    state = channel_chain.init_state(cfg, 1)
    key = jax.random.key(args.seed)
    user_noise = None
    if cfg.chn_type == "USER_ADD":
        raw = np.fromfile(args.chn_path, dtype=np.float32)
        user_noise = raw.reshape(-1, 2)
    gains = None
    if cfg.chn_type == "SYNCHRO" and args.sim_noise_path:
        ref = args.sim_noise_ref or esn0
        gains = fading_gains(read_fading_file(args.sim_noise_path), ref)
    i = 0
    try:
        while True:
            block = jnp.asarray(rx.receive(n))[None]
            if cfg.chn_type == "SYNCHRO":
                g = None if gains is None else gains[min(i, len(gains) - 1)]
                block, state = channel_chain.impair(block, cfg, state,
                                                    fading_gain=g)
            un = None
            if user_noise is not None:
                lo = (i * n) % len(user_noise)
                chunk = np.take(user_noise, range(lo, lo + n), axis=0,
                                mode="wrap")
                un = jnp.asarray(chunk)[None]
            y = channel_chain.add_noise(jax.random.fold_in(key, i), block,
                                        sigma, cfg, user_noise=un)
            tx.send(np.asarray(y[0]))
            i += 1
            if rx.loop and i * n >= len(rx._data):
                break
    except EndOfStream:
        pass
    tx.close()
    print(f"# channel processed {i} blocks (chn-type {cfg.chn_type})")


if __name__ == "__main__":
    main()
