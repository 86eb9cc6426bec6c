"""IC(0) incomplete-Cholesky preconditioner tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.solvers.base import get_solver
from lsbench_tpu.solvers.ic0 import ic0_factor, ic0_precond

from conftest import make_rhs


def _L_dense(n, cp, ci, cx):
    L = np.zeros((n, n))
    for j in range(n):
        L[ci[cp[j]:cp[j + 1]], j] = cx[cp[j]:cp[j + 1]]
    return L


def test_ic0_pattern_is_tril_A():
    A = poisson_2d(6)
    cp, ci, cx = ic0_factor(A)
    D = A.to_dense()
    L = _L_dense(A.nrows, cp, ci, cx)
    assert np.all((L != 0) <= (np.tril(D) != 0))
    assert cp[-1] == np.count_nonzero(np.tril(D))


def test_ic0_exact_when_no_fill():
    # Tridiagonal SPD: Cholesky has zero fill, so IC(0) == exact factor.
    n = 50
    D = (np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1)
         + np.diag(np.full(n - 1, -1.0), -1))
    A = CsrMatrix.from_dense(D)
    cp, ci, cx = ic0_factor(A)
    L = _L_dense(n, cp, ci, cx)
    np.testing.assert_allclose(L @ L.T, D, atol=1e-12)
    # Device apply == A^{-1} r.
    state, apply = ic0_precond(A, jnp.float64)
    r = make_rhs(n)
    z = np.asarray(apply(state, jnp.asarray(r)))
    np.testing.assert_allclose(z, np.linalg.solve(D, r), rtol=1e-10)


def test_ic0_llt_matches_A_on_pattern():
    # IC(0) residual A - LLᵀ is zero at every position of A's pattern.
    A = poisson_2d(7)
    D = A.to_dense()
    cp, ci, cx = ic0_factor(A)
    L = _L_dense(A.nrows, cp, ci, cx)
    R = D - L @ L.T
    np.testing.assert_allclose(R[D != 0], 0.0, atol=1e-12)


def test_cg_ic0_beats_jacobi(ref_data_dir):
    from lsbench_tpu.matrix.io import read_matrix
    A = read_matrix(ref_data_dir / "xn3b_A_18.txt")
    b = make_rhs(A.nrows)

    def run(precond):
        cls, params = get_solver("cg")
        params.update(rtol=1e-10, precond=precond)
        return cls(A, **params).solve(b)

    res_j = run("jacobi")
    res_ic = run("ic0")
    assert res_ic.converged
    assert res_ic.iters < res_j.iters * 0.7, (res_ic.iters, res_j.iters)
    x = np.asarray(res_ic.x)
    r = b - A.matvec(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-9


def test_ic0_shift_retry_on_breakdown():
    # Indefinite-leaning SPD-pattern matrix that breaks plain IC(0):
    # force a negative pivot by a near-singular leading block.
    D = np.array([[1.0, 2.0, 0.0],
                  [2.0, 1.0, 1.0],
                  [0.0, 1.0, 3.0]])
    # Not SPD — plain Cholesky fails; shift retry must still produce a
    # finite factor usable as a preconditioner.
    A = CsrMatrix.from_dense(D)
    cp, ci, cx = ic0_factor(A)
    assert np.all(np.isfinite(cx))
    L = _L_dense(3, cp, ci, cx)
    assert np.all(np.diag(L) > 0)


def test_ic0_missing_diagonal_raises():
    D = np.array([[0.0, 1.0], [1.0, 2.0]])
    A = CsrMatrix.from_dense(D)
    with pytest.raises(np.linalg.LinAlgError):
        ic0_factor(A)
