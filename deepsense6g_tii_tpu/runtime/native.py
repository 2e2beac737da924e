"""ctypes bindings for the native data-loader core (native_loader.cc).

Builds the shared library on first use with g++ (cached next to the source,
keyed by source mtime); every entry point has a pure-Python fallback, so the
framework works identically without a toolchain — native is a throughput
upgrade, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native_loader.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_lib_path() -> str:
    return os.path.join(_HERE, "_native_loader.so")


def _compile() -> str:
    so = _build_lib_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", so + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so + ".tmp", so)
    return so


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None when no toolchain is available."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if os.environ.get("DEEPSENSE_DISABLE_NATIVE"):
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(_compile())
        except (OSError, subprocess.CalledProcessError):
            _LIB_FAILED = True
            return None
        lib.ply_count.restype = ctypes.c_int64
        lib.ply_count.argtypes = [ctypes.c_char_p]
        lib.ply_read.restype = ctypes.c_int64
        lib.ply_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64]
        lib.bev_histogram.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p, ctypes.c_void_p]
        lib.batch_ply_to_bev.restype = ctypes.c_int64
        lib.batch_ply_to_bev.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int]
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        lib.kdtree_nearest.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_void_p,
                                       ctypes.c_int]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def read_ply(path: str) -> Optional[np.ndarray]:
    """(N, 3) float64 points via the native parser; None when unavailable or
    on parse failure (caller falls back to utils.ply)."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.ply_count(path.encode())
    if n < 0:
        return None
    out = np.empty((n, 3), np.float64)
    got = lib.ply_read(path.encode(), out.ctypes.data, n)
    return out if got == n else None


def bev_histogram(points: np.ndarray,
                  fov: Sequence[float]) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float64)
    fov_arr = np.asarray(fov, np.float32)
    out = np.empty((256, 256), np.float32)
    lib.bev_histogram(pts.ctypes.data, pts.shape[0], fov_arr.ctypes.data,
                      out.ctypes.data)
    return out


def batch_ply_to_bev(paths: Sequence[str], fovs: np.ndarray,
                     n_threads: int = 8) -> Optional[np.ndarray]:
    """Parse + project a batch of PLY files in native threads.
    Returns (len(paths), 256, 256) float32, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    blob = b"".join(p.encode() + b"\0" for p in paths)
    fovs = np.ascontiguousarray(fovs, np.float32)
    out = np.empty((len(paths), 256, 256), np.float32)
    failures = lib.batch_ply_to_bev(blob, len(paths), fovs.ctypes.data,
                                    out.ctypes.data, n_threads)
    if failures:
        return None
    return out


class KdTree:
    """Native 3D k-d tree (nearest neighbor only)."""

    def __init__(self, points: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(points[:, :3], np.float64)
        self._handle = lib.kdtree_build(self._pts.ctypes.data,
                                        self._pts.shape[0])

    def nearest(self, queries: np.ndarray, n_threads: int = 8) -> np.ndarray:
        q = np.ascontiguousarray(queries[:, :3], np.float64)
        out = np.empty((q.shape[0],), np.int32)
        self._lib.kdtree_nearest(self._handle, q.ctypes.data, q.shape[0],
                                 out.ctypes.data, n_threads)
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None
