"""ctypes bindings for the native C++ IQ reader (io hot path).

Builds gypsum_tpu/native/iqreader.cpp with g++ on first use (cached next to
the source, keyed on source mtime) and exposes a numpy-facing reader. The
pure-numpy path in io/sources.py remains the fallback when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "iqreader.cpp"
_LIB = _NATIVE_DIR / "_iqreader.so"

_DTYPE_CODES = {
    np.float32: 0,
    np.int16: 1,
    np.int8: 2,
    np.uint8: 3,
}


def _ensure_built() -> Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        "-o", str(_LIB), str(_SRC),
    ]
    _logger.info("building native IQ reader: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_lib_handle = None


def _load():
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(str(_ensure_built()))
        lib.iq_open.restype = ctypes.c_void_p
        lib.iq_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_float]
        lib.iq_n_samples.restype = ctypes.c_longlong
        lib.iq_n_samples.argtypes = [ctypes.c_void_p]
        lib.iq_read.restype = ctypes.c_longlong
        lib.iq_read.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.iq_close.argtypes = [ctypes.c_void_p]
        lib.iq_prefetch_start.restype = ctypes.c_int
        lib.iq_prefetch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.iq_prefetch_take.restype = ctypes.c_longlong
        lib.iq_prefetch_take.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib_handle = lib
    return _lib_handle


class NativeIqReader:
    """One open capture file; read(start, count) -> complex64[count]."""

    def __init__(self, info) -> None:
        lib = _load()
        code = _DTYPE_CODES[np.dtype(info.component_dtype).type]
        self._lib = lib
        self._handle = lib.iq_open(
            str(info.path).encode(), code, float(info.component_offset)
        )
        if not self._handle:
            raise OSError(f"native reader could not open {info.path}")
        self.n_samples = int(lib.iq_n_samples(self._handle))

    def read(self, start: int, count: int) -> np.ndarray:
        out = np.empty(count, dtype=np.complex64)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        # Serve from the C++ prefetch pipeline when the caller asked for the
        # block it speculatively queued; -1 means no/mismatched prefetch.
        got = self._lib.iq_prefetch_take(self._handle, int(start), int(count), ptr)
        if got < 0:
            got = self._lib.iq_read(self._handle, int(start), int(count), ptr)
        if got != count:
            raise EOFError(f"requested {count} samples at {start}, got {got}")
        return out

    def prefetch(self, start: int, count: int) -> None:
        """Queue [start, start+count) for conversion on the C++ worker thread
        (overlaps file IO + dtype conversion with device compute)."""
        if start + count <= self.n_samples:
            self._lib.iq_prefetch_start(self._handle, int(start), int(count))

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.iq_close(handle)
            self._handle = None
