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


def test_df64_smem_chunking_matches_unchunked(monkeypatch):
    """Layouts whose scalar-prefetched block-column ids exceed the SMEM
    budget split into multiple pallas_calls over group ranges (hit at
    n=262k with AMD-permuted operators: G*S ~ 3.4 MB of int32 vs 1 MiB
    SMEM — the AOT compiler rejects the single-call program). Forcing a
    tiny budget must produce >1 chunk and the same result."""
    import lsbench_tpu.ops.spmv_pallas as sp
    from lsbench_tpu.matrix.bsr import BsrDf64, BsrMatrix
    from lsbench_tpu.matrix.generate import random_spd

    A = random_spd(400, nnz_per_row=9, seed=3)
    df = BsrDf64.from_csr(A)
    bsr = BsrMatrix.from_csr(A)
    x = np.random.default_rng(0).random(A.nrows)
    y_ref = A.matvec(x)
    y1 = np.asarray(sp.spmv_bsr_df64(df, jnp.asarray(x)))

    monkeypatch.setattr(sp, "_SMEM_IDX_BUDGET_BYTES", 64)
    assert len(sp._group_chunks(df.blocks_hi.shape[0],
                                df.block_cols.shape[1])) > 1
    y2 = np.asarray(sp.spmv_bsr_df64(df, jnp.asarray(x)))
    np.testing.assert_allclose(y2, y1, rtol=0, atol=0)  # same math, exact
    assert np.linalg.norm(y2 - y_ref) / np.linalg.norm(y_ref) < 1e-12

    y3 = np.asarray(sp.spmv_bsr(bsr, jnp.asarray(x, jnp.float32)))
    assert (np.linalg.norm(y3 - y_ref) / np.linalg.norm(y_ref)) < 1e-5
