import numpy as np
import pytest

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d, poisson_3d, random_spd


def test_from_coo_dense_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.random((13, 17))
    d[d < 0.7] = 0.0
    d[0, 0] = 1.0  # ensure nnz > 0 and row/col 0 used
    A = CsrMatrix.from_dense(d)
    np.testing.assert_array_equal(A.to_dense(), d)


def test_matvec_vs_scipy():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    A = random_spd(200, nnz_per_row=9, seed=1)
    S = scipy_sparse.csr_matrix((A.vals, A.cols, A.offs), shape=A.shape)
    x = np.random.default_rng(2).random(200)
    np.testing.assert_allclose(A.matvec(x), S @ x, rtol=1e-13)


def test_empty_rows_preserved():
    # The reference reader mis-sizes matrices with empty rows
    # (lsbench-csr.c:65-70); we keep them.
    A = CsrMatrix.from_coo([0, 3], [0, 3], [1.0, 2.0])
    assert A.nrows == 4
    assert A.offs.tolist() == [0, 1, 1, 1, 2]


def test_transpose_diag_perm():
    A = random_spd(60, nnz_per_row=5, seed=4)
    At = A.transpose()
    np.testing.assert_allclose(At.to_dense(), A.to_dense().T)
    np.testing.assert_allclose(A.diagonal(), np.diag(A.to_dense()))

    perm = np.random.default_rng(5).permutation(60)
    B = A.permuted(perm)
    np.testing.assert_allclose(B.to_dense(), A.to_dense()[np.ix_(perm, perm)])


def test_poisson_generators():
    A = poisson_2d(4)
    assert A.nrows == 16
    d = A.to_dense()
    np.testing.assert_array_equal(d, d.T)
    assert np.all(np.linalg.eigvalsh(d) > 0)

    B = poisson_3d(3)
    assert B.nrows == 27
    db = B.to_dense()
    np.testing.assert_array_equal(db, db.T)
    assert np.all(np.linalg.eigvalsh(db) > 0)


def test_random_spd_is_spd():
    A = random_spd(80, seed=7)
    d = A.to_dense()
    np.testing.assert_allclose(d, d.T, atol=0)
    assert np.all(np.linalg.eigvalsh(d) > 0)


def test_sem_2d_generator_structure():
    """SEM-type generator (matrix/generate.py::sem_2d): SPD, symmetric,
    with the assembled-clique row-width skew of the reference workload
    (interior 9 / edge 15 / corner 25 at p=2 — tj7a/xn3b's pattern
    family, SURVEY §2.1)."""
    from lsbench_tpu.matrix.generate import sem_2d
    A = sem_2d(8, 2)
    assert A.nrows == 17 * 17
    widths = np.diff(A.offs)
    assert widths.min() == 9 and widths.max() == 25
    assert sorted(set(widths.tolist())) == [9, 15, 25]
    d = A.to_dense()
    np.testing.assert_allclose(d, d.T, atol=0)
    w = np.linalg.eigvalsh(d)
    assert w.min() > 0  # SPD (clique Laplacians + shift)
