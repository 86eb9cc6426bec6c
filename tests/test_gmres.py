import numpy as np
import pytest

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.solvers.base import get_solver

from conftest import make_rhs


def make(name, A, **kw):
    cls, params = get_solver(name)
    params.update(kw)
    return cls(A, **params)


def test_gmres_spd():
    A = poisson_2d(12)
    b = make_rhs(A.nrows)
    res = make("gmres", A, rtol=1e-10, restart=30).solve(b)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A.to_dense(), b), rtol=1e-6)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 150
    m = np.diag(8.0 + rng.random(n)) + np.triu(rng.random((n, n)), 1) * 0.4
    m[np.abs(m) < 0.35] = 0.0
    np.fill_diagonal(m, 8.0 + rng.random(n))
    A = CsrMatrix.from_dense(m)
    b = make_rhs(n)
    res = make("gmres", A, rtol=1e-10, restart=25).solve(b)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(m, b),
                               rtol=1e-5)


def test_gmres_block_jacobi_config():
    # The BASELINE config: GMRES(30) + block-Jacobi on the xn3b family.
    A = random_spd(256, seed=6)
    b = make_rhs(256)
    r_pt = make("gmres", A, rtol=1e-9, precond="jacobi").solve(b)
    r_bj = make("gmres", A, rtol=1e-9, precond="block_jacobi").solve(b)
    assert r_bj.converged
    assert r_bj.iters <= r_pt.iters
    np.testing.assert_allclose(np.asarray(r_bj.x),
                               np.linalg.solve(A.to_dense(), b), rtol=1e-5)


def test_block_jacobi_apply_exact_on_block_diagonal():
    # On a block-diagonal matrix the preconditioner is the exact inverse.
    rng = np.random.default_rng(8)
    k, nb = 8, 4
    blocks = []
    for _ in range(nb):
        q = rng.random((k, k))
        blocks.append(q @ q.T + k * np.eye(k))
    m = np.zeros((k * nb, k * nb))
    for i, bl in enumerate(blocks):
        m[i * k:(i + 1) * k, i * k:(i + 1) * k] = bl
    A = CsrMatrix.from_dense(m)
    from lsbench_tpu.solvers.preconditioners import block_jacobi_precond
    import jax.numpy as jnp
    state, apply = block_jacobi_precond(A, jnp.float64, block_size=k)
    r = rng.random(k * nb)
    z = np.asarray(apply(state, jnp.asarray(r)))
    np.testing.assert_allclose(z, np.linalg.solve(m, r), rtol=1e-10)


def test_gmres_reference_workload(ref_data_dir):
    from lsbench_tpu.matrix.io import read_matrix
    A = read_matrix(ref_data_dir / "xn3b_A_18.txt")
    b = make_rhs(A.nrows)
    res = make("gmres", A, rtol=1e-8, restart=30, precond="block_jacobi",
               ordering="rcm").solve(b)
    assert res.converged, f"relres={res.relres} iters={res.iters}"
