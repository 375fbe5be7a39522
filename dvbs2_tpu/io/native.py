"""ctypes bindings for the native host data plane (native/dvbs2_io.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the ABI is plain C via ctypes). Falls back cleanly if the toolchain
is unavailable — pure-Python paths in io/radio.py keep working.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "dvbs2_io.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libdvbs2_io.so")


@functools.lru_cache(maxsize=None)
def load() -> ctypes.CDLL:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", lib])
    dll = ctypes.CDLL(lib)
    dll.dvbs2_stream_open.restype = ctypes.c_void_p
    dll.dvbs2_stream_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_int]
    dll.dvbs2_stream_read.restype = ctypes.c_size_t
    dll.dvbs2_stream_read.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_size_t]
    dll.dvbs2_stream_close.argtypes = [ctypes.c_void_p]
    dll.dvbs2_pack_bits.argtypes = [ctypes.POINTER(ctypes.c_int8),
                                    ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_uint8)]
    dll.dvbs2_unpack_bits.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_size_t,
                                      ctypes.POINTER(ctypes.c_int8)]
    return dll


class NativeStream:
    """Threaded ring-buffer USER_BIN stream reader — the native analogue of
    the reference's dedicated radio receive thread + FIFO."""

    def __init__(self, path: str, capacity_floats: int = 1 << 22,
                 loop: bool = True):
        self._dll = load()
        self._h = self._dll.dvbs2_stream_open(path.encode(), capacity_floats,
                                              1 if loop else 0)
        if not self._h:
            raise FileNotFoundError(path)

    def read(self, n_samples: int) -> np.ndarray:
        """Next (n_samples, 2) float32 block; short only at EOF (no-loop)."""
        out = np.empty(n_samples * 2, np.float32)
        got = self._dll.dvbs2_stream_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size)
        return out[:got - got % 2].reshape(-1, 2)

    def close(self):
        if self._h:
            self._dll.dvbs2_stream_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pack_bits(bits: np.ndarray) -> np.ndarray:
    dll = load()
    bits = np.ascontiguousarray(bits.reshape(-1), np.int8)
    out = np.empty(bits.size // 8, np.uint8)
    dll.dvbs2_pack_bits(bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                        bits.size,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def unpack_bits(data: np.ndarray, n_bits: int) -> np.ndarray:
    dll = load()
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(n_bits, np.int8)
    dll.dvbs2_unpack_bits(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out
