"""Direct Cholesky solver — the CHOLMOD / cuSolverSp-equivalent path.

Reference protocols being mirrored:
- CHOLMOD (the default backend): fill-reducing ordering + factorization once
  in setup (cholmod-impl.h:25-26), timed solve = triangular solves
  (cholmod-impl.h:44-63). → `refactor_each_solve=False`.
- cusolver `csrlsvchol`: factor+solve *per trial* (cusparse.c:183-194), with
  a host-side RCM/AMD/METIS symmetric permutation first (cusparse.c:66-96).
  → `refactor_each_solve=True`.

TPU design: the symbolic side (ordering) runs on host (ordering/); the
numeric factorization is a dense blocked Cholesky on the MXU via XLA's
native `lax.linalg.cholesky`, and each timed solve is two dense triangular
solves. Dense storage is O(n²) — right-sized for the reference workload
(n ≤ 6.4k ⇒ ≤ 330 MB f64) and guarded above `max_dense_n`, where the
sparse level-scheduled path (solvers/sparse_cholesky.py) or the
mixed-precision Krylov path (cg_ir) take over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.solvers.base import SolveResult, Solver, register_solver


@register_solver("cholesky")
class CholeskySolver(Solver):

    def __init__(self, A: CsrMatrix, dtype=jnp.float64, ordering="amd",
                 refactor_each_solve=False, max_dense_n=20000, **params):
        super().__init__(A, **params)
        if A.nrows != A.ncols:
            raise ValueError("Cholesky requires a square matrix")
        if A.nrows > max_dense_n:
            raise ValueError(
                f"dense Cholesky guard: n={A.nrows} > {max_dense_n}; use "
                "sparse_cholesky (level-scheduled direct) or the "
                "mixed-precision Krylov solver (cg_ir) for matrices this size")
        self.dtype = jnp.dtype(dtype)
        self.refactor = bool(refactor_each_solve)
        self.ordering = ordering

        from lsbench_tpu.ordering import get_ordering
        perm = get_ordering(ordering, A)
        identity = bool(np.all(perm == np.arange(A.nrows)))
        Ap = A if identity else A.permuted(perm)
        perm_dev = None if identity else jnp.asarray(perm)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(A.nrows)
        inv_dev = None if identity else jnp.asarray(inv)

        # Factor the symmetric part: equivalent to CHOLMOD building an
        # stype=-1 (one-triangle) matrix from the input
        # (cholmod-impl.h:5-18); the workload is symmetric to file
        # round-off (BASELINE.md).
        dense_np = Ap.to_dense()
        dense = jnp.asarray((dense_np + dense_np.T) * 0.5, dtype=self.dtype)

        @jax.jit
        def _factor(a):
            return jax.lax.linalg.cholesky(a)

        @jax.jit
        def _trisolve(L, b):
            bp = b if perm_dev is None else b[perm_dev]
            bp = bp.astype(L.dtype)
            y = jsl.solve_triangular(L, bp, lower=True)
            x = jsl.solve_triangular(L, y, lower=True, trans=1)
            if inv_dev is not None:
                x = x[inv_dev]
            return x

        @jax.jit
        def _factor_and_solve(a, b):
            return _trisolve(_factor(a), b)

        self._dense = dense
        self._trisolve = _trisolve
        self._factor_and_solve = _factor_and_solve
        if self.refactor:
            self._L = None
        else:
            self._L = _factor(dense)
            jax.block_until_ready(self._L)

    def solve(self, b) -> SolveResult:
        b = jnp.asarray(b)
        if self.refactor:
            x = self._factor_and_solve(self._dense, b)
        else:
            x = self._trisolve(self._L, b)
        relres = self.residual_norm(x, b) / max(float(np.linalg.norm(np.asarray(b))), 1e-300)
        return SolveResult(x=x, iters=1, relres=relres,
                           converged=bool(np.isfinite(relres)))

    def solve_fn(self):
        if self.refactor:
            dense, fs = self._dense, self._factor_and_solve
            return lambda b: fs(dense, jnp.asarray(b))
        L, ts = self._L, self._trisolve
        return lambda b: ts(L, jnp.asarray(b))
