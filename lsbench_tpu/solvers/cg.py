"""Preconditioned conjugate gradient — the minimum end-to-end slice.

The reference's Krylov capability is Ginkgo BiCGSTAB+Jacobi with an implicit
residual-norm stop at 1e-4 of the initial residual (ginkgo.cpp:55-64). The
workload is SPD (SURVEY.md §2.1), so CG is the natural native solver; a
BiCGSTAB twin (solvers/bicgstab.py) covers the nonsymmetric role.

TPU design: the entire iteration runs inside one `jax.jit` via
`lax.while_loop` — no host round-trips per iteration, so at n≈4–6k the solve
is a single device program. The two dot products per iteration are computed
from one stacked reduction (`_fused_dots`) so the distributed version needs
exactly one `psum` per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.ell import EllMatrix
from lsbench_tpu.ops.spmv import spmv_ell
from lsbench_tpu.solvers.base import SolveResult, Solver, register_solver
from lsbench_tpu.solvers.preconditioners import get_preconditioner


def _fused_dots(*pairs):
    """Compute several dot products with one fused reduction.

    Returns a tuple of scalars. Stacking lets XLA (and later one psum)
    reduce them together.
    """
    stacked = jnp.stack([jnp.vdot(a, b) for (a, b) in pairs])
    return tuple(stacked[i] for i in range(len(pairs)))


def cg_loop(matvec, precond_apply, b, rtol, maxiter, dtype):
    """Jittable PCG. Returns (x, iters, rnorm, bnorm)."""
    b = b.astype(dtype)
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    # Guard rhs == 0: answer is x = 0 and the loop exits immediately.
    tol2 = (rtol * bnorm) ** 2

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond_apply(r0)
    p0 = z0
    rz0, rr0 = _fused_dots((r0, z0), (r0, r0))

    def cond(state):
        _, _, _, _, rr, it = state
        return jnp.logical_and(it < maxiter, rr > tol2)

    def body(state):
        x, r, p, rz, rr, it = state
        Ap = matvec(p)
        pAp, = _fused_dots((p, Ap))
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond_apply(r)
        rz_new, rr_new = _fused_dots((r, z), (r, r))
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, rr_new, it + 1)

    x, r, p, rz, rr, iters = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, rr0, jnp.int32(0)))
    return x, iters, jnp.sqrt(rr), bnorm


@register_solver("cg")
class CgSolver(Solver):
    """Jacobi- (or AMG-) preconditioned CG on the padded-row device layout."""

    def __init__(self, A: CsrMatrix, dtype=jnp.float64, precond="jacobi",
                 rtol=1e-8, maxiter=None, **params):
        super().__init__(A, **params)
        self.dtype = jnp.dtype(dtype)
        self.rtol = float(rtol)
        self.maxiter = int(maxiter) if maxiter is not None else max(10 * A.nrows, 1000)
        self.ell = EllMatrix.from_csr(A, dtype=self.dtype)
        self._pstate, papply = get_preconditioner(precond)(A, self.dtype)

        ell = self.ell
        rtol_c, maxiter_c, dt = self.rtol, self.maxiter, self.dtype

        @jax.jit
        def _solve(pstate, b):
            mv = lambda v: spmv_ell(ell, v)
            pc = lambda r: papply(pstate, r)
            return cg_loop(mv, pc, b, rtol_c, maxiter_c, dt)

        self._jit_solve = _solve

    def solve(self, b) -> SolveResult:
        b = jnp.asarray(b)
        x, iters, rnorm, bnorm = self._jit_solve(self._pstate, b)
        rnorm = float(rnorm)
        bnorm = float(bnorm)
        relres = rnorm / bnorm if bnorm > 0 else 0.0
        it = int(iters)
        return SolveResult(x=x, iters=it, relres=relres,
                           converged=relres <= self.rtol or bnorm == 0.0)

    def solve_fn(self):
        pstate = self._pstate
        jit_solve = self._jit_solve
        return lambda b: jit_solve(pstate, b)
