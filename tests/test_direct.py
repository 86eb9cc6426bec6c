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


def test_cholesky_exact_diag(tiny_matrix_file):
    from lsbench_tpu.matrix.io import read_matrix
    A = read_matrix(tiny_matrix_file)
    b = make_rhs(5)
    res = make("cholesky", A).solve(b)
    np.testing.assert_allclose(np.asarray(res.x), b / np.asarray([1, 2, 3, 4, 5.0]),
                               rtol=1e-12)


def test_nd_ordering_reduces_fill():
    # Native nested dissection (the METIS role, cusparse.c:75-79) must cut
    # Cholesky fill well below the natural ordering and stay in AMD's class.
    from lsbench_tpu.ordering import get_ordering
    A = poisson_2d(24)

    def fill(perm):
        L = np.linalg.cholesky(A.permuted(perm).to_dense())
        return int((np.abs(L) > 1e-12).sum())

    f_none = fill(get_ordering("none", A))
    f_amd = fill(get_ordering("amd", A))
    f_nd = fill(get_ordering("metis", A))
    assert f_nd < 0.6 * f_none
    assert f_nd < 1.5 * f_amd


@pytest.mark.parametrize("ordering", ["none", "rcm", "amd", "metis"])
def test_cholesky_poisson(ordering):
    A = poisson_2d(14)
    b = make_rhs(A.nrows)
    s = make("cholesky", A, ordering=ordering)
    res = s.solve(b)
    assert res.relres < 1e-12
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A.to_dense(), b), rtol=1e-8)


def test_cholmod_alias_factors_once_cusolver_refactors():
    A = random_spd(100, seed=1)
    b = make_rhs(100)
    cls, p1 = get_solver("cholmod")
    s1 = cls(A, **p1)
    assert s1.refactor is False and s1._L is not None
    cls, p2 = get_solver("cusolver")
    s2 = cls(A, **p2)
    assert s2.refactor is True and s2._L is None
    np.testing.assert_allclose(np.asarray(s1.solve(b).x),
                               np.asarray(s2.solve(b).x), rtol=1e-9)


def test_cholesky_reference_tolerance(ref_data_dir):
    # Direct solve hits the reference tolerance 1e-10 (cusparse.c:184)
    # against the ORIGINAL operator. Cholesky factorizes the symmetric
    # part (like CHOLMOD's stype=-1 triplet, cholmod-impl.h:13-16), and
    # xn3b is symmetric only to file round-off (3.6e-7, BASELINE.md) —
    # but the post-factor refinement passes target the raw matrix, so the
    # residual the reference's disabled oracle would compute
    # (norm(b−Ax), cholmod-impl.h:47-53) reaches fp64 grade.
    from lsbench_tpu.matrix.io import read_matrix
    A = read_matrix(ref_data_dir / "xn3b_A_18.txt")
    b = make_rhs(A.nrows)
    res = make("cholesky", A, ordering="amd").solve(b)
    assert res.relres < 1e-10  # raw-matrix residual, refined


def test_dense_guard_delegates_to_sparse():
    # The reference's default backend never refuses a size
    # (cholmod-impl.h:20-26): above the dense O(n²) guard the solver
    # transparently delegates to the sparse level-scheduled path and the
    # record carries the substitution.
    from lsbench_tpu.solvers.sparse_cholesky import SparseCholeskySolver
    A = random_spd(64, seed=0)
    b = make_rhs(64)
    s = make("cholesky", A, max_dense_n=32)
    assert isinstance(s._delegate, SparseCholeskySolver)
    res = s.solve(b)
    assert res.extra["delegated"] == "sparse_cholesky"
    assert res.relres < 1e-10
    np.testing.assert_allclose(np.asarray(s.solve_fn()(b)),
                               np.asarray(res.x), rtol=1e-12)

    # The IR twin (the fp32_ir CLI mapping) delegates the same way.
    s_ir = make("cholesky_ir", A, max_dense_n=32)
    res_ir = s_ir.solve(b)
    assert res_ir.extra["delegated"] == "sparse_cholesky"
    assert res_ir.relres < 1e-10


# -------------------------------------------- sparse (level-scheduled) path

def test_sparse_cholesky_factor_matches_dense():
    from lsbench_tpu.solvers.sparse_cholesky import (
        elimination_tree, numeric_factor, symbolic_rows, symmetrize)
    A = symmetrize(poisson_2d(10))
    parent = elimination_tree(A)
    loffs, lcols = symbolic_rows(A, parent)
    cp, ci, cx = numeric_factor(A, loffs, lcols)
    n = A.nrows
    L = np.zeros((n, n))
    L[ci, np.repeat(np.arange(n), np.diff(cp))] = cx
    np.testing.assert_allclose(L @ L.T, A.to_dense(), atol=1e-12)
    # Symbolic fill bounds the dense-Cholesky fill exactly (no dropping).
    Ld = np.linalg.cholesky(A.to_dense())
    assert int((np.abs(Ld) > 1e-14).sum()) <= cp[-1]


@pytest.mark.parametrize("ordering", ["none", "amd", "metis"])
def test_sparse_cholesky_solves(ordering):
    A = poisson_2d(14)
    b = make_rhs(A.nrows)
    s = make("sparse_cholesky", A, ordering=ordering)
    res = s.solve(b)
    assert res.relres < 1e-12
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A.to_dense(), b), rtol=1e-8)
    assert s.pad_waste < 10  # flat level packing keeps memory near O(nnz)


def test_sparse_cholesky_matches_dense_path():
    A = random_spd(200, seed=3)
    b = make_rhs(200)
    xd = np.asarray(make("cholesky", A, ordering="amd").solve(b).x)
    xs = np.asarray(make("sparse_cholesky", A, ordering="amd").solve(b).x)
    np.testing.assert_allclose(xs, xd, rtol=1e-9, atol=1e-12)


def test_cholesky_ir_reaches_fp64_accuracy():
    import numpy as np
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.solvers.base import get_solver
    A = poisson_2d(16)
    b = np.arange(A.nrows, dtype=np.float64)
    cls, params = get_solver("cholesky_ir")
    res = cls(A, rtol=1e-12, **params).solve(b)
    assert res.converged
    x = np.asarray(res.x)
    r = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert r < 1e-12, r
    assert res.extra["refine_passes"] <= 8


def test_cholesky_ir_cli_precision_mapping(tmp_path, capsys):
    from lsbench_tpu.harness.cli import main
    p = tmp_path / "m.txt"
    lines = ["5 1"] + [f"{i} {i} {float(i)}" for i in range(1, 6)]
    p.write_text("\n".join(lines) + "\n")
    rc = main(["--matrix", str(p), "--solver", "cholmod",
               "--precision", "fp32_ir", "--trials", "2", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"solver": "cholesky_ir"' in out or "cholesky_ir" in out


# ------------------------------------ blocked / host schedules (round 5)

@pytest.mark.parametrize("schedule", ["block", "host"])
def test_sparse_cholesky_schedules_agree(schedule):
    # The blocked partitioned-inverse sweep (~n/B sequential steps,
    # VERDICT r4 weak 1) and the native host CSC solve must reproduce
    # the level-scheduled answer to solver tolerance.
    A = poisson_2d(20)
    b = make_rhs(A.nrows)
    x_lvl = np.asarray(make("sparse_cholesky", A, ordering="amd",
                            schedule="level").solve(b).x)
    res = make("sparse_cholesky", A, ordering="amd",
               schedule=schedule).solve(b)
    assert res.relres < 1e-12
    np.testing.assert_allclose(np.asarray(res.x), x_lvl,
                               rtol=1e-9, atol=1e-12)


def test_sparse_cholesky_block_sequential_depth():
    # The point of the blocked schedule: sequential steps collapse from
    # the level count to ~n/B.
    A = poisson_2d(24)
    s = make("sparse_cholesky", A, schedule="block", block=256)
    assert s.n_blocks == -(-A.nrows // 256)
    assert s.n_blocks < s.n_levels_f / 3


def test_sparse_cholesky_multi_rhs():
    # cholmod factors once / solves repeatedly (cholmod-impl.h:44-63);
    # all schedules must take (n, k) RHS.
    A = poisson_2d(16)
    n = A.nrows
    B = np.stack([make_rhs(n), np.ones(n), np.linspace(0, 1, n)], axis=1)
    X_ref = np.linalg.solve(A.to_dense(), B)
    for schedule in ("block", "level", "host"):
        X = np.asarray(make("sparse_cholesky", A,
                            schedule=schedule).solve(B).x)
        np.testing.assert_allclose(X, X_ref, rtol=1e-8, atol=1e-10)


def test_dense_guard_delegate_multi_rhs():
    # ADVICE r4 item 1: the dense-guard delegation used to trace-crash
    # on 2-D b; the delegate now vmaps its refinement over columns.
    A = random_spd(64, seed=0)
    B = np.stack([make_rhs(64), np.ones(64)], axis=1)
    s = make("cholesky", A, max_dense_n=32)
    res = s.solve(B)
    assert res.extra["delegated"] == "sparse_cholesky"
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A.to_dense(), B),
                               rtol=1e-8, atol=1e-10)
