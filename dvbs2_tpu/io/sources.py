"""Bit sources and sinks — equivalents of aff3ct's Source_random_fast /
Source_user / Source_user_binary / Source_AZCW and Sink_user_binary
(reference: src/common/Factory/DVBS2/DVBS2.cpp:359-389).

RAND stays on-device (jax.random inside the jitted step — the fast path);
the file-fed sources are host-side generators handing (batch, K) int8
arrays to the chain, mirroring how the reference's file sources feed the
task graph from the host thread.
"""
from __future__ import annotations

import numpy as np

from dvbs2_tpu.io.radio import EndOfStream, read_src_file


class HostSource:
    """Base: ``next_batch(batch) -> (batch, K) int8``."""

    def __init__(self, K: int):
        self.K = K

    def next_batch(self, batch: int) -> np.ndarray:
        raise NotImplementedError


class AzcwSource(HostSource):
    """All-zero codeword source (Source_AZCW)."""

    def next_batch(self, batch: int) -> np.ndarray:
        return np.zeros((batch, self.K), np.int8)


class UserSource(HostSource):
    """.src text frames, cycled (Source_user; format conf/src/K_14232.src)."""

    def __init__(self, K: int, path: str, loop: bool = True):
        super().__init__(K)
        self.frames = read_src_file(path)
        assert self.frames.shape[1] == K, (
            f"{path}: K={self.frames.shape[1]} != expected {K}")
        self.loop = loop
        self._i = 0

    def next_batch(self, batch: int) -> np.ndarray:
        out = np.empty((batch, self.K), np.int8)
        for j in range(batch):
            if self._i >= len(self.frames):
                if not self.loop:
                    raise EndOfStream("source exhausted")
                self._i = 0
            out[j] = self.frames[self._i]
            self._i += 1
        return out


class UserBinarySource(HostSource):
    """Raw byte stream (e.g. an MPEG-TS) unpacked MSB-first into K-bit
    frames, cycled (Source_user_binary)."""

    def __init__(self, K: int, path: str, loop: bool = True):
        super().__init__(K)
        raw = np.fromfile(path, dtype=np.uint8)
        self.bits = np.unpackbits(raw).astype(np.int8)
        self.loop = loop
        self._pos = 0

    def next_batch(self, batch: int) -> np.ndarray:
        out = np.empty((batch, self.K), np.int8)
        for j in range(batch):
            end = self._pos + self.K
            if end > len(self.bits):
                if not self.loop:
                    raise EndOfStream("source exhausted")
                self._pos, end = 0, self.K
            out[j] = self.bits[self._pos:end]
            self._pos = end
        return out


def build_source(src_type: str, K: int, path=None, loop: bool = True):
    """Host-source dispatch (None for RAND: the chain generates on-device).

    Mirrors factory::DVBS2::build_source (DVBS2.cpp:359-389)."""
    if src_type == "RAND":
        return None
    if src_type == "AZCW":
        return AzcwSource(K)
    if src_type == "USER":
        if not path:
            raise ValueError("--src-type USER needs --src-path (.src file)")
        return UserSource(K, path, loop)
    if src_type == "USER_BIN":
        if not path:
            raise ValueError("--src-type USER_BIN needs --src-path")
        return UserBinarySource(K, path, loop)
    raise ValueError(f"unknown src_type {src_type!r}")


class BinarySink:
    """Pack decoded info bits MSB-first into bytes (Sink_user_binary)."""

    def __init__(self, path: str):
        self._fh = open(path, "wb")
        self._carry = np.zeros(0, np.uint8)

    def send(self, bits: np.ndarray) -> None:
        flat = np.concatenate([self._carry,
                               np.asarray(bits, np.uint8).ravel()])
        n8 = (len(flat) // 8) * 8
        np.packbits(flat[:n8]).tofile(self._fh)
        self._carry = flat[n8:]

    def close(self) -> None:
        if len(self._carry):
            np.packbits(self._carry).tofile(self._fh)  # zero-padded tail
        self._fh.close()
