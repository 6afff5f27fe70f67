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
        lib.prefetch_create_rect.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.prefetch_create_rect.restype = ctypes.c_void_p
        lib.image_remap.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.image_remap.restype = ctypes.c_int
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


def _remap_np(src: np.ndarray, rect_map: np.ndarray) -> np.ndarray:
    """Pure-numpy bilinear remap fallback (same border-clamp semantics)."""
    H, W = src.shape
    u = np.clip(rect_map[..., 0], 0.0, W - 1.001)
    v = np.clip(rect_map[..., 1], 0.0, H - 1.001)
    x0 = u.astype(np.int32)
    y0 = v.astype(np.int32)
    fx = u - x0
    fy = v - y0
    p00 = src[y0, x0]
    p01 = src[y0, x0 + 1]
    p10 = src[y0 + 1, x0]
    p11 = src[y0 + 1, x0 + 1]
    return ((p00 * (1 - fx) + p01 * fx) * (1 - fy)
            + (p10 * (1 - fx) + p11 * fx) * fy).astype(np.float32)


def remap(src: np.ndarray, rect_map: np.ndarray) -> Optional[np.ndarray]:
    """Native bilinear remap: (H, W) image + (H', W', 2) (u, v) map.
    Returns None if the native lib is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    m = np.ascontiguousarray(rect_map, np.float32)
    oh, ow = m.shape[:2]
    out = np.empty((oh, ow), np.float32)
    lib.image_remap(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    src.shape[0], src.shape[1],
                    m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    oh, ow,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class Prefetcher:
    """Background-thread decode-ahead over an ordered path list.

    With ``rect_map`` ((H', W', 2) float32 source coordinates), the
    decode workers also undistort-rectify each frame (the cv::remap
    stage of pinholeStereoCamera.cpp::rectifyImagesLR), so host IO and
    rectification both overlap device compute.
    """

    def __init__(self, paths: List[str], shape, capacity: int = 8,
                 n_threads: int = 2, rect_map: Optional[np.ndarray] = None):
        self.paths = paths
        self.shape = tuple(rect_map.shape[:2]) if rect_map is not None \
            else shape
        self._rect_map = rect_map
        lib = _get_lib()
        self._lib = lib
        if lib is None:
            self._handle = None
            return
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._keepalive = arr
        if rect_map is not None:
            m = np.ascontiguousarray(rect_map, np.float32)
            self._map_keepalive = m
            self._handle = lib.prefetch_create_rect(
                arr, len(paths), capacity, n_threads,
                m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                m.shape[0], m.shape[1])
        else:
            self._handle = lib.prefetch_create(arr, len(paths), capacity,
                                               n_threads)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def get(self, idx: int) -> np.ndarray:
        if self._handle is None:
            from plslam_tpu.io.dataset import _load_gray
            img = _load_gray(self.paths[idx])
            if self._rect_map is not None:
                img = _remap_np(img, self._rect_map)
            return img
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
