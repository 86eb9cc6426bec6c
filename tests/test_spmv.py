import jax.numpy as jnp
import numpy as np
import pytest

from lsbench_tpu.matrix.ell import EllMatrix
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.ops.spmv import spmv_ell


@pytest.mark.parametrize("make", [
    lambda: random_spd(100, nnz_per_row=7, seed=0),
    lambda: poisson_2d(11),
])
def test_spmv_ell_matches_host(make):
    A = make()
    ell = EllMatrix.from_csr(A)
    x = np.random.default_rng(1).random(A.ncols)
    y = np.asarray(spmv_ell(ell, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.matvec(x), rtol=1e-12)


def test_spmv_f32():
    A = random_spd(64, nnz_per_row=5, seed=2)
    ell = EllMatrix.from_csr(A, dtype=jnp.float32)
    x = np.random.default_rng(3).random(64).astype(np.float32)
    y = np.asarray(spmv_ell(ell, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.matvec(x), rtol=1e-5)
    assert y.dtype == np.float32


def test_ell_padding_alignment():
    A = random_spd(100, nnz_per_row=7, seed=0)
    ell = EllMatrix.from_csr(A, row_align=128, width_align=8)
    assert ell.n_pad % 128 == 0
    assert ell.k % 8 == 0
    x = np.random.default_rng(4).random(100)
    np.testing.assert_allclose(np.asarray(spmv_ell(ell, jnp.asarray(x))),
                               A.matvec(x), rtol=1e-12)
