"""Device blocked band Cholesky (solvers/band_cholesky.py) — the MXU
numeric-factorization path (SURVEY.md §7.4; CHOLMOD supernodal role,
cholmod-impl.h:26)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_rhs
from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.solvers.band_cholesky import (BandCholeskySolver,
                                               band_layout, factor_band,
                                               solve_band)
from lsbench_tpu.solvers.base import get_solver


def _band_factor_dense(A, nb=128):
    """Run the device factor and reassemble L densely for comparison."""
    import jax
    W0, slabs, nsteps, w, n_pad = band_layout(A, nb=nb)
    Ld, Lp = jax.jit(lambda W, S: factor_band(W, S, nb=nb))(
        jnp.asarray(W0, jnp.float64), jnp.asarray(slabs, jnp.float64))
    Ld, Lp = np.asarray(Ld), np.asarray(Lp)
    nfac = nsteps * nb
    L = np.zeros((nfac, nfac))
    for j in range(nsteps):
        r0 = j * nb
        L[r0:r0 + nb, r0:r0 + nb] = Ld[j]
        rows = min(w, nfac - (r0 + nb))
        L[r0 + nb:r0 + nb + rows, r0:r0 + nb] = Lp[j][:rows]
    return L, nsteps, w


def test_factor_matches_numpy_cholesky():
    A = poisson_2d(12)  # naturally banded (w = 12)
    n = A.nrows
    sym = A  # already symmetric
    L, nsteps, w = _band_factor_dense(sym, nb=128)
    ref = np.linalg.cholesky(sym.to_dense())
    np.testing.assert_allclose(L[:n, :n], ref, atol=1e-10)


def test_solve_band_matches_dense_solve():
    import jax
    A = poisson_2d(12)
    n = A.nrows
    nb = 128
    W0, slabs, nsteps, w, n_pad = band_layout(A, nb=nb)
    Ld, Lp = jax.jit(lambda W, S: factor_band(W, S, nb=nb))(
        jnp.asarray(W0, jnp.float64), jnp.asarray(slabs, jnp.float64))
    b = make_rhs(n)
    bp = jnp.zeros(nsteps * nb).at[:n].set(jnp.asarray(b))
    x = np.asarray(solve_band(Ld, Lp, bp, nb=nb))[:n]
    ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-9)


def test_band_solver_registered_and_converges():
    A = poisson_2d(20)
    b = make_rhs(A.nrows)
    cls, params = get_solver("cholesky_band")
    s = cls(A, **params)
    res = s.solve(b)
    assert res.converged
    assert res.extra["precision_mode"] == "fp32_ir_auto"
    relres = (np.linalg.norm(b - A.matvec(np.asarray(res.x, np.float64)))
              / np.linalg.norm(b))
    assert relres <= 1e-10


def test_band_solver_reference_workload(ref_data_dir):
    from lsbench_tpu.matrix.io import read_matrix
    A = read_matrix(ref_data_dir / "xn3b_A_18.txt")
    b = make_rhs(A.nrows)
    s = BandCholeskySolver(A, ordering="rcm")
    res = s.solve(b)
    assert res.converged, f"relres={res.relres}"
    relres = (np.linalg.norm(b - A.matvec(np.asarray(res.x, np.float64)))
              / np.linalg.norm(b))
    assert relres <= 1e-10  # reference direct tolerance, cusparse.c:184
    assert "factor_s" in s.setup_breakdown


def test_band_guard_rejects_wide_matrices():
    A = random_spd(256, nnz_per_row=40, seed=1)  # unordered random: w ~ n
    with pytest.raises(ValueError, match="band"):
        BandCholeskySolver(A, ordering="none", max_band_mb=0.1)


def test_band_solver_contract():
    A = poisson_2d(16)
    b = make_rhs(A.nrows)
    s = BandCholeskySolver(A)
    fn = s.solve_fn()
    out = fn(b)
    assert not isinstance(out, tuple)
    np.testing.assert_allclose(np.asarray(out), np.asarray(s.solve(b).x),
                               atol=1e-9)
