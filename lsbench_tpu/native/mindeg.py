"""ctypes binding for the native minimum-degree ordering (mindeg.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from lsbench_tpu.native import load_library

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = load_library("mindeg.cpp", "libmindeg.so")
        lib.lsb_min_degree.argtypes = [
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.lsb_min_degree.restype = ctypes.c_int
        lib.lsb_amd.argtypes = lib.lsb_min_degree.argtypes
        lib.lsb_amd.restype = ctypes.c_int
        _lib = lib
    return _lib


def min_degree(offs: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Native min-degree ordering of a symmetrized adjacency graph.

    Same algorithm and tie-break as ordering/amd.py::min_degree_graph —
    permutations are bit-identical. Raises NativeUnavailable if the
    toolchain is missing (callers fall back to Python).
    """
    lib = _get_lib()
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    perm = np.empty(n, dtype=np.int64)
    rc = lib.lsb_min_degree(n, offs, cols, perm)
    if rc != 0:
        raise RuntimeError("native min-degree failed")
    return perm


def amd_approx(offs: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Approximate minimum degree (supervariables + w-pass degrees +
    element absorption — mindeg.cpp::lsb_amd). ~30-50x faster than the
    exact scheme at n=262k with comparable fill."""
    lib = _get_lib()
    perm = np.empty(n, dtype=np.int64)
    rc = lib.lsb_amd(int(n),
                     np.ascontiguousarray(offs, np.int64),
                     np.ascontiguousarray(cols, np.int32), perm)
    if rc != 0:
        raise RuntimeError("lsb_amd failed to order the graph")
    return perm
