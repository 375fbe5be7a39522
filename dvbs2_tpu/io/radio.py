"""File-based radio — equivalent of Radio_user_binary / Radio_NO (reference:
src/common/Module/Radio/Radio_user_binary/Radio_user_binary.cpp:56-115,
Radio_NO/Radio_NO.cpp:19-28).

USER_BIN IQ format: raw interleaved float32 I/Q samples, 2*N per frame
(reference: Radio_user_binary.cpp:66,83) — directly memory-mappable into the
framework's (..., N, 2) split re/im layout. EOF behavior mirrors the
reference: loop (default) or raise ``EndOfStream`` (``--rad-rx-no-loop``).
"""
from __future__ import annotations

import numpy as np


class EndOfStream(Exception):
    """Host-side analogue of spu::tools::processing_aborted at file EOF."""


class NativeThreadedRadio:
    """Receive-path radio backed by the native threaded ring stream
    (native/dvbs2_io.cpp — the TPU-native analogue of Radio_USRP's
    dedicated receive thread + preallocated FIFO,
    reference: Radio_USRP.cpp:141-180 / --rad-threaded --rad-fifo-size):
    a C++ producer thread pre-reads the file into a ring buffer so host
    IO overlaps device compute.  FileRadio-compatible ``receive``."""

    def __init__(self, path: str, loop: bool = True,
                 fifo_bytes: float = 1e8):
        from dvbs2_tpu.io import native
        self.path = path
        self._stream = native.NativeStream(
            path, capacity_floats=max(int(fifo_bytes) // 4, 1 << 16),
            loop=loop)

    def receive(self, n_samples: int) -> np.ndarray:
        out = self._stream.read(n_samples)
        if out.shape[0] < n_samples:
            raise EndOfStream(self.path)
        return out

    def close(self) -> None:
        self._stream.close()


def open_rx_radio(args):
    """RX radio per the rad-* argument group: the native threaded ring
    when --rad-threaded (falling back to FileRadio if the native
    toolchain is unavailable), else the plain file reader."""
    loop = not args.rad_rx_no_loop
    if getattr(args, "rad_threaded", False):
        try:
            return NativeThreadedRadio(args.rad_rx_file_path, loop=loop,
                                       fifo_bytes=args.rad_fifo_size)
        except Exception as e:
            print(f"# rad-threaded unavailable ({e}); using FileRadio")
    return FileRadio(args.rad_rx_file_path, "r", loop=loop)


class FileRadio:
    """Reader/writer of USER_BIN IQ streams in (N, 2) float32 blocks."""

    def __init__(self, path: str, mode: str = "r", loop: bool = True):
        assert mode in ("r", "w")
        self.path = path
        self.mode = mode
        self.loop = loop
        if mode == "r":
            self._data = np.fromfile(path, dtype=np.float32)
            if self._data.size % 2:
                self._data = self._data[:-1]
            self._data = self._data.reshape(-1, 2)
            self._pos = 0
        else:
            self._fh = open(path, "wb")

    # -- receive -----------------------------------------------------------
    def receive(self, n_samples: int) -> np.ndarray:
        """Next (n_samples, 2) block; wraps at EOF if loop else raises."""
        out = np.empty((n_samples, 2), np.float32)
        filled = 0
        while filled < n_samples:
            avail = len(self._data) - self._pos
            if avail == 0:
                if not self.loop:
                    raise EndOfStream(self.path)
                self._pos = 0
                avail = len(self._data)
            take = min(avail, n_samples - filled)
            out[filled:filled + take] = self._data[self._pos:self._pos + take]
            self._pos += take
            filled += take
        return out

    # -- send --------------------------------------------------------------
    def send(self, block: np.ndarray) -> None:
        assert self.mode == "w"
        np.asarray(block, np.float32).tofile(self._fh)

    def close(self) -> None:
        if self.mode == "w":
            self._fh.close()


def read_src_file(path: str) -> np.ndarray:
    """.src format: 'n_frames\\nK\\n' header then whitespace bits
    (reference: conf/src/K_14232.src:1-3)."""
    toks = open(path).read().split()
    n_frames, k = int(toks[0]), int(toks[1])
    bits = np.array(toks[2:2 + n_frames * k], dtype=np.int8)
    return bits.reshape(n_frames, k)


def write_src_file(path: str, bits: np.ndarray) -> None:
    bits = np.atleast_2d(bits)
    with open(path, "w") as f:
        f.write(f"{bits.shape[0]}\n{bits.shape[1]}\n")
        for row in bits:
            f.write(" ".join(str(int(b)) for b in row) + "\n")
