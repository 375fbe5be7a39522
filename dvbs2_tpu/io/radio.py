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


class RadioNO:
    """Null radio — no-op send, zero-block receive (reference:
    src/common/Module/Radio/Radio_NO/Radio_NO.cpp:19-28)."""

    def receive(self, n_samples: int) -> np.ndarray:
        return np.zeros((n_samples, 2), np.float32)

    def send(self, block: np.ndarray) -> None:
        pass

    def close(self) -> None:
        pass


#: USRP parameter surface of the reference's factory::Radio
#: (Factory/Module/Radio/Radio.cpp:27-51), with the reference defaults.
USRP_DEFAULTS = dict(
    rad_clk_rate=33.333333e6, rad_rx_rate=None, rad_rx_freq=1090e6,
    rad_rx_gain=10.0, rad_rx_subdev_spec="", rad_rx_ant="RX2",
    rad_tx_rate=None, rad_tx_freq=1090e6, rad_tx_gain=10.0,
    rad_tx_subdev_spec="", rad_tx_ant="TX/RX",
    rad_ip_addr="192.168.10.2", rad_usrp_type="")


class RadioUSRP:
    """UHD-backed hardware radio surface (reference:
    src/common/Module/Radio/Radio_USRP/Radio_USRP.cpp:12-180 — multi_usrp
    with optional dedicated TX/RX threads + preallocated FIFOs).

    This class carries the complete, validated USRP parameter set so that
    reference ``--rad-type USRP`` command lines translate mechanically;
    actually opening the stream requires the UHD Python bindings and
    attached hardware, neither of which exists in a TPU pod environment —
    construction raises a clear RuntimeError in that case instead of a
    deep import failure.  Setting rx/tx rate enables that direction, like
    the reference (Radio.cpp: rx enabled iff --rad-rx-rate given).
    """

    def __init__(self, **params):
        unknown = set(params) - set(USRP_DEFAULTS)
        if unknown:
            raise ValueError(f"unknown USRP radio params: {sorted(unknown)}")
        self.params = {**USRP_DEFAULTS, **params}
        self.rx_enabled = self.params["rad_rx_rate"] is not None
        self.tx_enabled = self.params["rad_tx_rate"] is not None
        try:
            import uhd  # noqa: F401  (not bundled: hardware-only dependency)
        except ImportError as e:
            raise RuntimeError(
                "--rad-type USRP needs the UHD Python bindings and attached "
                "USRP hardware (reference: Radio_USRP.cpp:12-47); neither is "
                "available on this host. Use --rad-type USER_BIN with "
                "--rad-rx-file-path/--rad-tx-file-path for file-based IQ, "
                f"or NO for a null radio. (import uhd failed: {e})"
            ) from e
        raise RuntimeError("USRP stream bring-up not implemented: no "
                           "hardware in the supported environments")


def _usrp_params_from_args(args) -> dict:
    return {k: getattr(args, k) for k in USRP_DEFAULTS
            if getattr(args, k, None) is not None or k in
            ("rad_rx_rate", "rad_tx_rate")}


def open_rx_radio(args):
    """RX radio per the rad-* argument group (the factory::Radio dispatch,
    reference: Factory/Module/Radio/Radio.cpp:116-126): USER_BIN reads the
    IQ file — through the native threaded ring when --rad-threaded
    (falling back to FileRadio if the native toolchain is unavailable) —
    USRP opens hardware (gated), NO yields the null radio."""
    rad_type = getattr(args, "rad_type", "USER_BIN")
    if rad_type == "NO":
        return RadioNO()
    if rad_type == "USRP":
        return RadioUSRP(**_usrp_params_from_args(args))
    loop = not args.rad_rx_no_loop
    if getattr(args, "rad_threaded", False):
        try:
            return NativeThreadedRadio(args.rad_rx_file_path, loop=loop,
                                       fifo_bytes=args.rad_fifo_size)
        except Exception as e:
            print(f"# rad-threaded unavailable ({e}); using FileRadio")
    return FileRadio(args.rad_rx_file_path, "r", loop=loop)


def open_tx_radio(args):
    """TX-direction factory dispatch (send path of the same factory)."""
    rad_type = getattr(args, "rad_type", "USER_BIN")
    if rad_type == "NO":
        return RadioNO()
    if rad_type == "USRP":
        return RadioUSRP(**_usrp_params_from_args(args))
    return FileRadio(args.rad_tx_file_path, "w")


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
