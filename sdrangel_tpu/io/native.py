"""ctypes bindings for the native I/O library (native/sdriq_loader.cc).

Builds libsdriq.so on first use (g++ available in the image); every entry
point has a NumPy fallback so the framework stays usable without a
toolchain. The native path avoids Python-loop conversion costs in the host
ingest pipeline (the reference runs this layer in C++ device threads).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "sdriq_loader.cc")
_SO = os.path.join(_REPO, "native", "libsdriq.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        if _lib is False:
            raise OSError("native loader unavailable (earlier build failed)")
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            # temp file + atomic rename: never CDLL a half-written .so
            tmp = f"{_SO}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp, _SO)
    except Exception:
        _lib = False
        raise
    lib = ctypes.CDLL(_SO)
    lib.sdriq_open.restype = ctypes.c_void_p
    lib.sdriq_open.argtypes = [ctypes.c_char_p]
    lib.sdriq_sample_rate.restype = ctypes.c_int32
    lib.sdriq_sample_rate.argtypes = [ctypes.c_void_p]
    lib.sdriq_center_frequency.restype = ctypes.c_uint64
    lib.sdriq_center_frequency.argtypes = [ctypes.c_void_p]
    lib.sdriq_sample_size.restype = ctypes.c_uint32
    lib.sdriq_sample_size.argtypes = [ctypes.c_void_p]
    lib.sdriq_n_samples.restype = ctypes.c_uint64
    lib.sdriq_n_samples.argtypes = [ctypes.c_void_p]
    lib.sdriq_read_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sdriq_read_i16.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int16),
    ]
    lib.sdriq_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeSdriq:
    """Native mmap .sdriq reader with wrapped block reads."""

    def __init__(self, path: str):
        lib = _load()
        self._lib = lib
        self._h = lib.sdriq_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.sample_rate = lib.sdriq_sample_rate(self._h)
        self.center_frequency = lib.sdriq_center_frequency(self._h)
        self.sample_size = lib.sdriq_sample_size(self._h)
        self.n_samples = lib.sdriq_n_samples(self._h)

    def read_f32(self, start: int, count: int) -> np.ndarray:
        out = np.empty((count, 2), dtype=np.float32)
        self._lib.sdriq_read_f32(
            self._h, start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def read_i16(self, start: int, count: int) -> np.ndarray:
        out = np.empty((count, 2), dtype=np.int16)
        self._lib.sdriq_read_i16(
            self._h, start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        )
        return out

    def close(self):
        if self._h:
            self._lib.sdriq_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
