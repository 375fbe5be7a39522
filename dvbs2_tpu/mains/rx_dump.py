"""IQ recorder — the `dvbs2_rx_dump` equivalent (reference:
src/mains/RX/dump.cpp:1-61: radio.receive -> Sink binary, dump.bin).

    python -m dvbs2_tpu.mains.rx_dump --rad-rx-file-path live.bin \
        --dump-frames 100 --dump-filename dump

Reads through the native threaded ring-buffer stream when available
(io/native.NativeStream — the analogue of the reference's dedicated radio
receive thread + FIFO), falling back to the plain file reader.
"""
import numpy as np

from dvbs2_tpu import cli
from dvbs2_tpu.io.radio import EndOfStream, FileRadio


def main(argv=None):
    p = cli.build_parser("dvbs2_tpu.rx_dump")
    p.add_argument("--dump-frames", type=int, default=100)
    args = p.parse_args(argv)
    cfg = cli.config_from_args(args)
    assert args.rad_rx_file_path, "--rad-rx-file-path required"
    n = cfg.rad_frame_size
    try:
        from dvbs2_tpu.io.native import NativeStream
        radio = NativeStream(args.rad_rx_file_path,
                             loop=not args.rad_rx_no_loop)
        native = True
    except Exception:
        radio = FileRadio(args.rad_rx_file_path, "r",
                          loop=not args.rad_rx_no_loop)
        native = False
    def recv(k):
        if native:
            blk = radio.read(k)
            if len(blk) < k:
                raise EndOfStream("eof")
            return blk
        return radio.receive(k)

    out_path = f"{args.dump_filename}.bin"
    done = 0
    with open(out_path, "wb") as f:
        try:
            for _ in range(args.dump_frames):
                np.asarray(recv(n), np.float32).tofile(f)
                done += 1
        except EndOfStream:
            pass
    print(f"# dumped {done} frames ({done * n} samples) to {out_path} "
          f"({'native stream' if native else 'file'} reader)")


if __name__ == "__main__":
    main()
