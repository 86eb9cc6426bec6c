"""Synthetic SPD test matrices.

The reference ships pressure-Poisson-type SPD matrices (tests/tj7a_*,
tests/xn3b_*; measured SPD in SURVEY.md §2.1). These generators produce
structurally similar workloads of any size so benchmarks and tests do not
depend on the reference data files being present.
"""

from __future__ import annotations

import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix


def poisson_2d(nx: int, ny: int | None = None) -> CsrMatrix:
    """5-point Laplacian on an nx × ny grid (SPD, 0-based)."""
    ny = ny or nx
    n = nx * ny
    idx = np.arange(n).reshape(nx, ny)
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.full(r.size, v))

    add(idx, idx, 4.0)
    add(idx[1:, :], idx[:-1, :], -1.0)
    add(idx[:-1, :], idx[1:, :], -1.0)
    add(idx[:, 1:], idx[:, :-1], -1.0)
    add(idx[:, :-1], idx[:, 1:], -1.0)
    return CsrMatrix.from_coo(np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals), nrows=n, ncols=n)


def poisson_3d(nx: int, ny: int | None = None, nz: int | None = None) -> CsrMatrix:
    """7-point Laplacian on an nx × ny × nz grid (SPD, 0-based)."""
    ny = ny or nx
    nz = nz or nx
    n = nx * ny * nz
    idx = np.arange(n).reshape(nx, ny, nz)
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.full(r.size, v))

    add(idx, idx, 6.0)
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(1, None)
        hi[axis] = slice(None, -1)
        add(idx[tuple(lo)], idx[tuple(hi)], -1.0)
        add(idx[tuple(hi)], idx[tuple(lo)], -1.0)
    return CsrMatrix.from_coo(np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals), nrows=n, ncols=n)


def random_spd(n: int, nnz_per_row: int = 23, seed: int = 0) -> CsrMatrix:
    """Random diagonally-dominant SPD matrix with ~nnz_per_row entries/row.

    Mimics the reference workload statistics (22–25 nnz/row, SURVEY.md §2.1).
    """
    rng = np.random.default_rng(seed)
    k = max(1, (nnz_per_row - 1) // 2)
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, size=rows.size)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    vals = -rng.random(rows.size)
    # Symmetrize.
    r = np.concatenate([rows, cols])
    c = np.concatenate([cols, rows])
    v = np.concatenate([vals, vals]) * 0.5
    off = CsrMatrix.from_coo(r, c, v, nrows=n, ncols=n)
    # Diagonal dominance: diag = 1 + sum|offdiag| per row.
    rowsum = np.zeros(n)
    np.add.at(rowsum, off.row_indices(), np.abs(off.vals))
    dr = np.arange(n)
    return CsrMatrix.from_coo(
        np.concatenate([off.row_indices(), dr]),
        np.concatenate([off.cols, dr]),
        np.concatenate([off.vals, 1.0 + rowsum]),
        nrows=n, ncols=n)
