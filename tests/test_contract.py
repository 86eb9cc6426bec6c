"""solve_fn() contract regression tests.

Round-1 shipped solve_fn() implementations returning the solver's raw
jitted tuple (x, iters, ...) instead of the documented `fn(b) -> x`
(base.py), which crashed bench.py on hardware (BENCH_r01.json). These
tests pin the contract for every registered solver and the distributed
solvers: the callable must return a single array whose leading slice
equals solve(b).x (distributed solvers may return the padded sharded
vector; the first n entries must match).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.solvers.base import get_solver

from conftest import make_rhs


def _check_contract(solver, b, n, atol=1e-6):
    fn = solver.solve_fn()
    out = fn(b)
    assert not isinstance(out, (tuple, list)), (
        f"{solver.name}.solve_fn() returned {type(out).__name__}, "
        "must return the solution array only")
    x_fn = np.asarray(out, dtype=np.float64)
    assert x_fn.ndim == 1
    res = solver.solve(b)
    x_ref = np.asarray(res.x, dtype=np.float64)
    # fn may return the padded distributed vector: compare the first n.
    assert x_fn.shape[0] >= n
    np.testing.assert_allclose(x_fn[:n], x_ref[:n], atol=atol, rtol=1e-5)


@pytest.mark.parametrize("name", [
    "cg", "cg_ir", "bicgstab", "gmres", "cholesky", "cholesky_ir",
    "sparse_cholesky", "amg",
])
def test_solve_fn_returns_solution_array(name):
    A = poisson_2d(12)  # SPD, n=144
    b = make_rhs(A.nrows)
    cls, params = get_solver(name)
    solver = cls(A, **params)
    _check_contract(solver, b, A.nrows)


@pytest.mark.parametrize("alias", [
    "cholmod", "cusolver", "hypre", "amgx", "paralmond", "ginkgo",
])
def test_reference_alias_solve_fn_contract(alias):
    A = random_spd(96, nnz_per_row=7, seed=3)
    b = make_rhs(A.nrows)
    cls, params = get_solver(alias)
    solver = cls(A, **params)
    # Fixed-cycle AMG aliases don't converge to tight tol in 1-2 cycles;
    # only the return-shape part of the contract is universal.
    fn = solver.solve_fn()
    out = fn(b)
    assert not isinstance(out, (tuple, list))
    assert np.asarray(out).ndim == 1


def test_distributed_solve_fn_contract():
    import jax

    from lsbench_tpu.parallel.dist_cg import DistributedCg
    from lsbench_tpu.parallel.mesh import make_row_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    A = poisson_2d(16)
    b = make_rhs(A.nrows)
    mesh = make_row_mesh()
    solver = DistributedCg(A, mesh, rtol=1e-10, dtype=jnp.float64)
    _check_contract(solver, b, A.nrows, atol=1e-8)
