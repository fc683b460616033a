"""Host-side KD-tree KNN (ctypes over native/kdtree.cpp) with scipy fallback.

API matches the reference's ``knn_query_fast`` (ext/common bind.cpp:13-17):
``knn_query(query [N,3], ref [M,3], k) -> (sq_dist [N,k], idx [N,k])``."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SO = _NATIVE_DIR / "libkdtree.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        src = _NATIVE_DIR / "kdtree.cpp"
        if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO),
                            str(src)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64]
        lib.kdtree_query.argtypes = [
            ctypes.c_void_p, np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int32)]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


class KDTree:
    def __init__(self, points: np.ndarray):
        self.ref = np.ascontiguousarray(points, np.float32)
        lib = _load()
        self._h = lib.kdtree_build(self.ref, len(self.ref)) if lib else None
        self._scipy = None
        if not self._h:
            from scipy.spatial import cKDTree
            self._scipy = cKDTree(self.ref)

    def query(self, queries: np.ndarray, k: int = 1):
        q = np.ascontiguousarray(queries, np.float32)
        if self._h:
            d = np.empty((len(q), k), np.float32)
            i = np.empty((len(q), k), np.int32)
            _lib.kdtree_query(self._h, q, len(q), k, d, i)
            return d, i
        d, i = self._scipy.query(q, k=k)
        d = np.atleast_2d(d ** 2).reshape(len(q), k).astype(np.float32)
        i = np.atleast_2d(i).reshape(len(q), k).astype(np.int32)
        return d, i

    def __del__(self):
        if getattr(self, "_h", None):
            try:
                _lib.kdtree_free(self._h)
            except Exception:
                pass


def knn_query(query: np.ndarray, ref: np.ndarray, k: int = 1):
    """One-shot query (knn_query_fast equivalent): (sq_dist, idx)."""
    if len(ref) < 64:  # brute force, same threshold as the reference
        d = np.sum((query[:, None, :] - ref[None]) ** 2, -1)
        idx = np.argsort(d, axis=1)[:, :k]
        return np.take_along_axis(d, idx, 1).astype(np.float32), \
            idx.astype(np.int32)
    return KDTree(ref).query(query, k)
