"""Host-side sparse × sparse products (setup-time only).

Galerkin coarse operators (RAP) are built once during AMG setup — the
reference does this inside Hypre/AmgX on device (hypre.c:97), but setup is
not in the timed solve path (SURVEY.md §7.5), so a host product keeps the
device code static-shaped. Pure NumPy (vectorized expansion + duplicate-sum
via CsrMatrix.from_coo); no SciPy.
"""

from __future__ import annotations

import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix


def spgemm(A: CsrMatrix, B: CsrMatrix) -> CsrMatrix:
    """C = A @ B on host. Native Gustavson (native/spgemm.cpp) when the
    toolchain is available — no expanded COO intermediate, ~60x faster on
    the smoothed-aggregation RAP — with the NumPy expansion as fallback."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    try:
        from lsbench_tpu.native.spgemm import spgemm_native
        c_offs, c_cols, c_vals = spgemm_native(
            A.nrows, A.offs, A.cols, A.vals, B.offs, B.cols, B.vals, B.ncols)
        return CsrMatrix(nrows=A.nrows, ncols=B.ncols, offs=c_offs,
                         cols=c_cols, vals=c_vals)
    except Exception:
        pass  # no native toolchain — fall through to NumPy expansion
    # For each nnz (i,k,v) of A, expand the k-th row of B.
    a_rows = A.row_indices()
    counts = (B.offs[A.cols + 1] - B.offs[A.cols]).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        # Product is structurally empty; represent as explicit zero diag-less
        # matrix with a single stored zero to satisfy from_coo's nnz>0.
        return CsrMatrix.from_coo([0], [0], [0.0], nrows=A.nrows, ncols=B.ncols)

    out_i = np.repeat(a_rows, counts)
    out_va = np.repeat(A.vals, counts)
    # Flat indices into B's nnz arrays: for A-nnz t, the range
    # [B.offs[A.cols[t]], B.offs[A.cols[t]+1]).
    starts = B.offs[A.cols].astype(np.int64)
    # Standard "ranges from starts+counts" construction.
    ends = np.cumsum(counts)
    flat = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts) \
        + np.repeat(starts, counts)
    out_j = B.cols[flat]
    out_v = out_va * B.vals[flat]
    return CsrMatrix.from_coo(out_i, out_j, out_v, nrows=A.nrows,
                              ncols=B.ncols)


def rap(R: CsrMatrix, A: CsrMatrix, P: CsrMatrix) -> CsrMatrix:
    """Galerkin triple product R A P (coarse-grid operator)."""
    return spgemm(spgemm(R, A), P)


def drop_small(A: CsrMatrix, tol: float) -> CsrMatrix:
    """Drop entries with |a_ij| <= tol * max|row| (keeps diagonal)."""
    if tol <= 0:
        return A
    r = A.row_indices()
    rowmax = np.zeros(A.nrows)
    np.maximum.at(rowmax, r, np.abs(A.vals))
    keep = (np.abs(A.vals) > tol * rowmax[r]) | (r == A.cols)
    return CsrMatrix.from_coo(r[keep], A.cols[keep], A.vals[keep],
                              nrows=A.nrows, ncols=A.ncols,
                              sum_duplicates=False)
