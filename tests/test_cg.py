import numpy as np
import pytest

from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.solvers.base import get_solver

from conftest import make_rhs


def _solve(A, b, **kw):
    cls, params = get_solver("cg")
    params.update(kw)
    solver = cls(A, **params)
    return solver, solver.solve(b)


def test_cg_diag():
    from lsbench_tpu.matrix.csr import CsrMatrix
    A = CsrMatrix.from_dense(np.diag([1.0, 2, 3, 4, 5]))
    b = make_rhs(5)
    _, res = _solve(A, b, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), b / np.diag(A.to_dense()),
                               rtol=1e-10)
    assert res.converged


def test_cg_poisson_matches_dense_solve():
    A = poisson_2d(12)
    b = make_rhs(A.nrows)
    solver, res = _solve(A, b, rtol=1e-10)
    expect = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-7)
    assert res.converged
    assert solver.residual_norm(res.x, b) <= 1e-10 * np.linalg.norm(b) * 10


def test_cg_random_spd_jacobi_helps():
    A = random_spd(300, seed=11)
    b = make_rhs(300)
    _, res_none = _solve(A, b, rtol=1e-9, precond="none")
    _, res_jac = _solve(A, b, rtol=1e-9, precond="jacobi")
    assert res_none.converged and res_jac.converged
    assert res_jac.iters <= res_none.iters


def test_cg_maxiter_reports_nonconvergence():
    A = poisson_2d(12)
    b = make_rhs(A.nrows)
    _, res = _solve(A, b, rtol=1e-12, maxiter=3)
    assert res.iters == 3
    assert not res.converged


def test_cg_fp32():
    A = poisson_2d(8)
    b = make_rhs(A.nrows)
    _, res = _solve(A, b, rtol=1e-5, dtype="float32")
    expect = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-2)


def test_cg_reference_workload(ref_data_dir):
    # The real workload: SPD, cond 3.2e3 (BASELINE.md) — converges to 1e-8.
    A = read_matrix(ref_data_dir / "xn3b_A_18.txt")
    b = make_rhs(A.nrows)
    solver, res = _solve(A, b, rtol=1e-8)
    assert res.converged, f"relres={res.relres} iters={res.iters}"
    rr = solver.residual_norm(res.x, b) / np.linalg.norm(b)
    assert rr <= 1e-7


def test_cg_chebyshev_precond():
    import numpy as np
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.solvers.base import get_solver
    A = poisson_2d(20)
    b = np.arange(A.nrows, dtype=np.float64)

    def run(precond, **pp):
        cls, params = get_solver("cg")
        params.update(rtol=1e-10, precond=precond, precond_params=pp or None)
        return cls(A, **params).solve(b)

    res_c = run("chebyshev", degree=4)
    res_j = run("jacobi")
    assert res_c.converged
    # Each preconditioned iteration does 4 extra matvecs; it must cut the
    # iteration count by well more than a trivial amount.
    assert res_c.iters < res_j.iters * 0.5, (res_c.iters, res_j.iters)
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(res_c.x), x_ref, rtol=1e-6,
                               atol=1e-8)
