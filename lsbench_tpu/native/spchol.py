"""ctypes binding for the native sparse-Cholesky numeric factor
(spchol.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from lsbench_tpu.native import load_library

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = load_library("spchol.cpp", "libspchol.so")
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.lsb_chol_numeric.argtypes = [ctypes.c_longlong, i64, i32, f64,
                                         i64, i64, i64, i64, f64]
        lib.lsb_chol_numeric.restype = ctypes.c_longlong
        _lib = lib
    return _lib


def chol_numeric(n, a_offs, a_cols, a_vals, cp, ci, lrow_offs, lrow_cols
                 ) -> np.ndarray:
    """Native numeric factorization over the symbolic pattern. Same
    algorithm as sparse_cholesky.numeric_factor; raises LinAlgError on a
    non-positive pivot with the same message shape."""
    lib = _get_lib()
    cx = np.zeros(int(cp[-1]), dtype=np.float64)
    rc = lib.lsb_chol_numeric(
        int(n),
        np.ascontiguousarray(a_offs, np.int64),
        np.ascontiguousarray(a_cols, np.int32),
        np.ascontiguousarray(a_vals, np.float64),
        np.ascontiguousarray(cp, np.int64),
        np.ascontiguousarray(ci, np.int64),
        np.ascontiguousarray(lrow_offs, np.int64),
        np.ascontiguousarray(lrow_cols, np.int64),
        cx)
    if rc != 0:
        raise np.linalg.LinAlgError(
            f"matrix not positive definite at column {rc - 1}")
    return cx
