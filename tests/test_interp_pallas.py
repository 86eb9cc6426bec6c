"""Window-ELL transfer-operator kernel (ops/interp_pallas.py): the
narrow-stencil P/R layout that replaces 8×128 BSR padding (~260× at
n=262k — VERDICT r4 missing 4). Interpret mode on CPU; the hardware
lane re-checks on the chip (tests/test_tpu_hw.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.ops.interp_pallas import WindowEll, spmv_well
from lsbench_tpu.solvers.amg import (AmgOptions, build_matrix_hierarchy,
                                     align_coarse_levels)


def _hierarchy(n=64, coarsening="classical"):
    return build_matrix_hierarchy(
        poisson_2d(n), AmgOptions(coarsening=coarsening, theta=0.25))


def test_window_ell_matches_host_matvec():
    mats, _ = _hierarchy()
    rng = np.random.default_rng(0)
    checked = 0
    for m in mats:
        for name in ("P", "R"):
            M = m[name]
            op = WindowEll.from_csr(M, max_j=16)
            if op is None:
                continue
            v = rng.standard_normal(M.ncols)
            y = np.asarray(spmv_well(op, jnp.asarray(v, jnp.float32)))
            ref = M.matvec(v)
            np.testing.assert_allclose(y, ref, rtol=2e-5,
                                       atol=2e-5 * np.abs(ref).max())
            checked += 1
    assert checked >= 3


def test_window_ell_engages_on_aligned_hierarchy():
    # align_coarse (on by default) keeps every level oriented, so the
    # fine-level P AND R both fit narrow windows — without alignment R's
    # span is arbitrary (RCM orientation) and the layout refuses.
    mats, _ = _hierarchy(n=96)
    P0, R0 = mats[0]["P"], mats[0]["R"]
    opP = WindowEll.from_csr(P0)
    opR = WindowEll.from_csr(R0, max_j=16)
    assert opP is not None and opR is not None
    # The economics: ≥10× fewer streamed bytes than the 8x128 BSR floor
    # (nnz-proportional vs 4 KB per touched block).
    from lsbench_tpu.solvers.amg import _bsr_bytes
    assert opP.bytes_streamed * 10 < _bsr_bytes(P0)


def test_alignment_preserves_galerkin_products():
    mats, Ac = _hierarchy(n=48, coarsening="sa")
    for l, m in enumerate(mats):
        Ad, P, R = m["A"].to_dense(), m["P"].to_dense(), m["R"].to_dense()
        nxt = mats[l + 1]["A"].to_dense() if l + 1 < len(mats) else \
            Ac.to_dense()
        np.testing.assert_allclose(R @ Ad @ P, nxt, atol=1e-12)
        np.testing.assert_allclose(R, P.T, atol=0)
        np.testing.assert_allclose(
            m["dinv"], 1.0 / np.diag(Ad), rtol=1e-12)


def test_window_ell_refuses_unbanded():
    # A random-permutation operator has full-width windows: from_csr
    # must return None (callers keep the BSR/ELL path).
    rng = np.random.default_rng(1)
    n = 2048
    perm = rng.permutation(n)
    rows = np.arange(n)
    M = CsrMatrix.from_coo(rows, perm, np.ones(n), nrows=n, ncols=n)
    assert WindowEll.from_csr(M, max_j=4) is None


def test_window_ell_padding_rows():
    # n not a multiple of 128: padded rows must return exactly zero.
    rng = np.random.default_rng(2)
    n, nc = 300, 100
    rows = np.repeat(np.arange(n), 2)
    cols = np.clip(np.repeat(np.arange(n) // 3, 2)
                   + np.tile([0, 1], n), 0, nc - 1)
    vals = rng.standard_normal(2 * n)
    M = CsrMatrix.from_coo(rows, cols, vals, nrows=n, ncols=nc)
    op = WindowEll.from_csr(M)
    assert op is not None
    v = rng.standard_normal(nc)
    y = np.asarray(spmv_well(op, jnp.asarray(v, jnp.float32)))
    ref = M.matvec(v)
    np.testing.assert_allclose(y, ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


def test_build_hierarchy_selects_well_for_transfers():
    # The calibrated cost model (solvers/amg.py) must pick window-ELL
    # for the fine-level transfer operators of the production classical
    # hierarchy and keep dense/BSR for the smoother operators.
    import jax.numpy as jnp

    from lsbench_tpu.solvers.amg import AmgOptions, build_hierarchy
    level_params, level_aps, _ = build_hierarchy(
        poisson_2d(96), AmgOptions(coarsening="classical", theta=0.25),
        jnp.float32, "bsr")
    from lsbench_tpu.ops.interp_pallas import WindowEll
    assert isinstance(level_params[0]["p"], WindowEll)
    # (A-operator selection is model-driven: well at small n where the
    # compare cost undercuts even a small BSR stream, BSR at 262k where
    # J and n push the compare cost past the stream bound — see the
    # calibration constants in solvers/amg.py.)


def test_sparse_cholesky_auto_schedule_prefers_host():
    from lsbench_tpu.solvers.sparse_cholesky import SparseCholeskySolver
    A = poisson_2d(12)
    s = SparseCholeskySolver(A)  # schedule="auto"
    try:
        from lsbench_tpu.native.spchol import tri_solve  # noqa: F401
        assert s.schedule == "host"
    except Exception:
        assert s.schedule == "block"
