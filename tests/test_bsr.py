import jax.numpy as jnp
import numpy as np
import pytest

from lsbench_tpu.matrix.bsr import BR, GPS, BsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.ordering.amd import amd_ordering
from lsbench_tpu.ordering.rcm import bandwidth, rcm_ordering
from lsbench_tpu.ops.spmv_pallas import spmv_bsr


@pytest.mark.parametrize("make", [
    lambda: random_spd(300, nnz_per_row=9, seed=0),
    lambda: poisson_2d(17),
    lambda: random_spd(64, nnz_per_row=3, seed=2),
])
@pytest.mark.parametrize("variant", ["prefetch", "onehot"])
def test_spmv_bsr_matches_host(make, variant):
    A = make()
    B = BsrMatrix.from_csr(A)
    assert B.n_groups % GPS == 0
    x = np.random.default_rng(1).random(A.ncols)
    y = np.asarray(spmv_bsr(B, jnp.asarray(x), variant=variant))
    yref = A.matvec(x)
    rel = np.abs(y - yref) / (1.0 + np.abs(yref))
    assert rel.max() < 1e-5


def test_bsr_reference_impl():
    A = poisson_2d(13)
    B = BsrMatrix.from_csr(A)
    x = np.random.default_rng(2).random(A.ncols)
    y = np.asarray(B.matvec_reference(jnp.asarray(x)))
    rel = np.abs(y - A.matvec(x)) / (1.0 + np.abs(A.matvec(x)))
    assert rel.max() < 1e-5


def test_rcm_reduces_bandwidth_and_blocks():
    A = random_spd(400, nnz_per_row=7, seed=9)
    p = rcm_ordering(A)
    assert sorted(p.tolist()) == list(range(400))
    B = A.permuted(p)
    assert bandwidth(B) < bandwidth(A)
    assert BsrMatrix.from_csr(B).slots <= BsrMatrix.from_csr(A).slots


def test_amd_is_permutation():
    A = random_spd(200, nnz_per_row=7, seed=10)
    p = amd_ordering(A)
    assert sorted(p.tolist()) == list(range(200))


@pytest.mark.parametrize("make", [
    lambda: random_spd(300, nnz_per_row=9, seed=0),
    lambda: poisson_2d(17),
    lambda: random_spd(64, nnz_per_row=3, seed=2),
])
def test_spmv_bsr_compact_matches_host(make):
    from lsbench_tpu.matrix.bsr import BsrCompact
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr_compact
    A = make()
    B = BsrCompact.from_csr(A)
    x = np.random.default_rng(1).random(A.ncols)
    y = np.asarray(spmv_bsr_compact(B, jnp.asarray(x)))
    yref = A.matvec(x)
    rel = np.abs(y - yref) / (1.0 + np.abs(yref))
    assert rel.max() < 1e-5
    # Exact-block layout never streams more than the padded layout.
    assert B.bytes_streamed <= BsrMatrix.from_csr(A).bytes_streamed


def test_bsr_compact_reference_impl():
    from lsbench_tpu.matrix.bsr import BsrCompact
    A = poisson_2d(13)
    B = BsrCompact.from_csr(A)
    x = np.random.default_rng(2).random(A.ncols)
    y = np.asarray(B.matvec_reference(jnp.asarray(x)))
    rel = np.abs(y - A.matvec(x)) / (1.0 + np.abs(A.matvec(x)))
    assert rel.max() < 1e-5


def test_matvec_xla_selector_path():
    # Gather-free XLA SpMV (fp64 TPU path) matches host at full precision.
    A = poisson_2d(15)
    B = BsrMatrix.from_csr(A, dtype=jnp.float64)
    x = np.random.default_rng(3).random(A.ncols)
    y = np.asarray(B.matvec_xla(jnp.asarray(x)))
    np.testing.assert_allclose(y, A.matvec(x), rtol=1e-13, atol=1e-13)


def test_cg_bsr_xla_layout():
    from lsbench_tpu.solvers.base import get_solver
    A = poisson_2d(13)
    b = np.arange(A.nrows, dtype=np.float64)
    cls, params = get_solver("cg")
    params.update(layout="bsr_xla", rtol=1e-10)
    res = cls(A, **params).solve(b)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A.to_dense(), b), rtol=1e-7)


def test_bsr_classed_reference_impl():
    from lsbench_tpu.matrix.bsr import BsrClassed
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr_classed
    A = poisson_2d(17)  # big enough for several slot classes
    B = BsrClassed.from_csr(A, n_classes=3)
    assert B.bytes_streamed <= BsrMatrix.from_csr(A).bytes_streamed
    x = np.random.default_rng(4).random(A.ncols)
    yref = A.matvec(x)
    for y in (B.matvec_reference(jnp.asarray(x)),
              spmv_bsr_classed(B, jnp.asarray(x))):  # CPU → oracle fallback
        rel = np.abs(np.asarray(y) - yref) / (1.0 + np.abs(yref))
        assert rel.max() < 1e-5


def test_bsr_classed_covers_all_groups():
    from lsbench_tpu.matrix.bsr import GPS, BsrClassed
    A = poisson_2d(11)
    B = BsrClassed.from_csr(A, n_classes=4)
    sgs = np.concatenate([np.asarray(o) for o in B.oidx])
    assert sorted(sgs.tolist()) == list(range(B.n_groups // GPS))
    # every nnz lands in exactly one class
    total = sum(float(np.abs(np.asarray(b)).sum()) for b in B.blocks)
    assert total == pytest.approx(float(np.abs(A.vals).sum()), rel=1e-6)


def test_bsr_df64_accuracy():
    # Double-float SpMV: ~2^-48 relative accuracy, far beyond f32's 2^-24.
    from lsbench_tpu.matrix.bsr import BsrDf64
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr, spmv_bsr_df64
    from lsbench_tpu.matrix.generate import random_spd
    A = random_spd(300, nnz_per_row=17, seed=2)
    B = BsrDf64.from_csr(A)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.ncols) * 1e3
    y = np.asarray(spmv_bsr_df64(B, jnp.asarray(x)))
    yref = A.matvec(x)
    rel = np.abs(y - yref).max() / np.abs(yref).max()
    assert rel < 5e-13, rel
    # sanity: plain f32 kernel is ~1e-7-ish on the same input
    y32 = np.asarray(BsrMatrix.from_csr(A).matvec(jnp.asarray(x)))
    rel32 = np.abs(y32 - yref).max() / np.abs(yref).max()
    assert rel32 > 1e-9  # f32 path really is f32


def test_bsr_df64_lo_shared_hi_matches():
    # spmv_bsr_df64_lo (hi taken from the f32 BsrMatrix, lo shipped
    # alone — solvers/refine.py's shared-hi operand) must be bit-equal
    # to the two-array spmv_bsr_df64: the hi arrays are the same f64
    # values rounded once to f32.
    from lsbench_tpu.matrix.bsr import BsrDf64, BsrMatrix
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr_df64, spmv_bsr_df64_lo
    from lsbench_tpu.matrix.generate import random_spd
    A = random_spd(300, nnz_per_row=17, seed=4)
    B64 = BsrDf64.from_csr(A)
    B32 = BsrMatrix.from_csr(A, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(B32.blocks),
                                  np.asarray(B64.blocks_hi))
    x = jnp.asarray(np.random.default_rng(3).standard_normal(A.ncols) * 50)
    y_ref = np.asarray(spmv_bsr_df64(B64, x))
    y_lo = np.asarray(spmv_bsr_df64_lo(B32, B64.blocks_lo, x))
    np.testing.assert_array_equal(y_lo, y_ref)


def test_df64_primitives_exact():
    from lsbench_tpu.ops.spmv_pallas import _two_prod, _two_sum, _split_f32
    import jax
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(10000).astype(np.float32) * 1e4)
    b = jnp.asarray(rng.standard_normal(10000).astype(np.float32))
    s, e = jax.jit(_two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, e = jax.jit(_two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)
    h, l = jax.jit(_split_f32)(a)
    np.testing.assert_array_equal(np.asarray(h, np.float64) + np.asarray(l, np.float64), np.asarray(a, np.float64))


def test_bsr_df64_hi_lo_split_exact():
    # hi + lo must reconstruct the f64 values exactly (the split is
    # computed on HOST — routing through a device f64 array round-trips
    # tens of MB of emulated f64 over the remote-TPU tunnel).
    from lsbench_tpu.matrix.bsr import BsrDf64, _bsr_host_layout
    from lsbench_tpu.matrix.generate import random_spd
    A = random_spd(200, nnz_per_row=13, seed=9)
    B = BsrDf64.from_csr(A)
    assert B.blocks_hi.dtype == jnp.float32 and B.blocks_lo.dtype == jnp.float32
    b64, bcols = _bsr_host_layout(A)
    rec = np.asarray(B.blocks_hi, np.float64) + np.asarray(B.blocks_lo, np.float64)
    scale = np.abs(b64).max()
    assert np.abs(rec - b64).max() <= scale * 2.0 ** -47  # two-round split
    np.testing.assert_array_equal(np.asarray(B.block_cols), bcols)


def test_sel_is_lazy():
    from lsbench_tpu.matrix.bsr import BsrMatrix
    from lsbench_tpu.matrix.generate import random_spd
    A = random_spd(200, nnz_per_row=9, seed=11)
    op = BsrMatrix.from_csr(A, dtype=jnp.float64)
    assert op.sel is None          # never built eagerly (1.6 GB at n=262k)
    op.ensure_sel()
    assert op.sel is not None
    x = np.random.default_rng(0).random(A.ncols)
    y = np.asarray(op.matvec_xla(jnp.asarray(x)))
    yref = A.matvec(x)
    assert np.abs(y - yref).max() / np.abs(yref).max() < 1e-12


def test_classed_layout_wins_gate():
    from lsbench_tpu.matrix.bsr import classed_layout_wins
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.ordering.rcm import rcm_ordering
    # Reference scale: too small for classing to pay its call overhead.
    small = poisson_2d(48)
    assert classed_layout_wins(small.permuted(rcm_ordering(small))) is False
    # Large + padded: classing wins (gate at n_sg >= 1024 i.e. n >= 131k).
    big = poisson_2d(384)  # n=147k
    assert classed_layout_wins(big.permuted(rcm_ordering(big))) is True
