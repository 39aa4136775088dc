"""ctypes bindings for the in-tree C++ HNSW index.

API mirrors the hnswlib subset the reference uses (``neighbors.py:110-120``):
``init_index``-style construction, ``add_items``, ``knn_query`` returning
``(indices, squared_l2_distances)``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hnsw.cpp")
_LIB = os.path.join(_HERE, "_hnsw.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-pthread", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64,
        ]
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_add_items.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.restype = ctypes.c_int
        _lib = lib
    return _lib


class HNSW:
    """Approximate KNN over squared-l2, built on the native C++ graph."""

    def __init__(
        self,
        dim: int,
        max_elements: int = 0,
        M: int = 16,
        ef_construction: int = 200,
        random_seed: int = 0,
    ):
        self._lib = _load()
        self.dim = dim
        self._handle = self._lib.hnsw_create(
            dim, max_elements, M, ef_construction, random_seed
        )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.hnsw_free(handle)
            self._handle = None

    def add_items(self, data) -> None:
        data = np.ascontiguousarray(data, dtype=np.float32)
        if data.ndim != 2 or data.shape[1] != self.dim:
            raise ValueError(
                f"expected (n, {self.dim}) data, got {data.shape}"
            )
        self._lib.hnsw_add_items(self._handle, data.shape[0], data)

    def knn_query(
        self, queries, k: int, ef: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        n = queries.shape[0]
        if ef is None:
            ef = max(2 * k, 64)
        idx = np.empty((n, k), dtype=np.int32)
        dist = np.empty((n, k), dtype=np.float32)
        self._lib.hnsw_search(self._handle, n, queries, k, ef, idx, dist)
        return idx.astype(np.int64), dist

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._handle)
