"""ctypes bindings for the native C++ prefetch loader.

Builds ``native/prefetch_loader.cpp`` on first use (g++, cached next to the
source) and exposes it as an iterator of numpy records. Used to feed
fixed-shape preprocessed clip tensors (written by ``write_record_file``)
with the file IO fully off the Python thread.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SRC = os.path.join(_NATIVE_DIR, "prefetch_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libprefetch.so")
_BUILD_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    with _BUILD_LOCK:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
            subprocess.run(cmd, check=True)
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.pl_create.restype = ctypes.c_void_p
        lib.pl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.pl_next.restype = ctypes.c_int
        lib.pl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.pl_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def write_record_file(path: str, array: np.ndarray) -> None:
    """Write one fixed-shape record (raw bytes, C order)."""
    np.ascontiguousarray(array).tofile(path)


class NativePrefetchLoader:
    """Iterate records from ``paths`` as (file_index, array) with a C++
    thread pool reading ahead into a bounded ring buffer."""

    def __init__(
        self,
        paths: Sequence[str],
        record_shape: Tuple[int, ...],
        dtype=np.uint8,
        capacity: int = 8,
        num_threads: int = 2,
        timeout_ms: int = 60000,
    ):
        self.paths = list(paths)
        self.shape = tuple(record_shape)
        self.dtype = np.dtype(dtype)
        self.record_bytes = int(np.prod(self.shape)) * self.dtype.itemsize
        self.timeout_ms = timeout_ms
        lib = _lib()
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._handle = lib.pl_create(
            arr, len(self.paths), self.record_bytes, capacity, num_threads
        )
        self._lib_ref = lib
        self._closed = False

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        buf = np.empty(self.record_bytes, np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        while True:
            idx = self._lib_ref.pl_next(self._handle, ptr, self.timeout_ms)
            if idx == -1:
                break
            if idx < -1:
                raise IOError(f"failed to read record {-2 - idx}: "
                              f"{self.paths[-2 - idx]!r}")
            yield idx, buf.view(self.dtype).reshape(self.shape).copy()

    def close(self) -> None:
        if not self._closed:
            self._lib_ref.pl_destroy(self._handle)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
