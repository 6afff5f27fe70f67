"""ctypes bindings for the native image decode + prefetch runtime.

Builds lazily via make on first use; every entry point degrades
gracefully (returns None) so the pure-Python PIL path keeps working when
no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libplslamio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.image_size.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
        lib.image_size.restype = ctypes.c_int
        lib.image_decode_gray.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_int]
        lib.image_decode_gray.restype = ctypes.c_int
        lib.prefetch_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                        ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.prefetch_create.restype = ctypes.c_void_p
        lib.prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.prefetch_get.restype = ctypes.c_int
        lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.prefetch_destroy.restype = None
        _lib = lib
        return _lib


def load_gray(path: str) -> Optional[np.ndarray]:
    """Decode to (H, W) float32 [0,1], or None if the native lib is
    unavailable / decode failed (caller falls back to PIL)."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value), dtype=np.float32)
    n = lib.image_decode_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if n != out.size:
        return None
    return out


class Prefetcher:
    """Background-thread decode-ahead over an ordered path list."""

    def __init__(self, paths: List[str], shape, capacity: int = 8,
                 n_threads: int = 2):
        self.paths = paths
        self.shape = shape
        lib = _get_lib()
        self._lib = lib
        if lib is None:
            self._handle = None
            return
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._keepalive = arr
        self._handle = lib.prefetch_create(arr, len(paths), capacity, n_threads)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def get(self, idx: int) -> np.ndarray:
        if self._handle is None:
            from plslam_tpu.io.dataset import _load_gray
            return _load_gray(self.paths[idx])
        out = np.empty(self.shape, dtype=np.float32)
        n = self._lib.prefetch_get(
            self._handle, idx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
        if n < 0:
            raise IOError(f"prefetch decode failed for {self.paths[idx]}")
        return out[:n // self.shape[1], :]

    def close(self):
        if self._handle is not None:
            self._lib.prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
