"""Halo-exchange distributed SpMV and CG on the simulated 8-device mesh."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from lsbench_tpu.matrix.generate import poisson_2d, random_spd
from lsbench_tpu.ordering.rcm import rcm_ordering
from lsbench_tpu.parallel.dist_cg import DistributedCg
from lsbench_tpu.parallel.dist_spmv import build_halo_plan, halo_spmv_local
from lsbench_tpu.parallel.mesh import ROWS, make_row_mesh

from conftest import make_rhs


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_row_mesh(8)


def test_halo_plan_banded(mesh8):
    A = poisson_2d(16)  # bandwidth 16 ≪ nloc=32
    plan = build_halo_plan(A, 8, jnp.float64)
    assert not plan.needs_all_gather
    assert plan.halo <= plan.nloc


def test_halo_spmv_matches_host(mesh8):
    A = poisson_2d(16)
    n = A.nrows
    plan = build_halo_plan(A, 8, jnp.float64)
    x = np.random.default_rng(0).random(plan.n_pad)
    x[A.nrows:] = 0.0

    @jax.jit
    @partial(shard_map, mesh=mesh8,
             in_specs=(P(ROWS, None), P(ROWS, None), P(ROWS)),
             out_specs=P(ROWS))
    def spmv(vals_l, cols_l, x_l):
        return halo_spmv_local(plan.halo, vals_l, cols_l, x_l)

    row_shard = NamedSharding(mesh8, P(ROWS, None))
    vec_shard = NamedSharding(mesh8, P(ROWS))
    y = spmv(jax.device_put(plan.vals, row_shard),
             jax.device_put(plan.cols, row_shard),
             jax.device_put(jnp.asarray(x), vec_shard))
    np.testing.assert_allclose(np.asarray(y)[:n], A.matvec(x[:n]), rtol=1e-12)


def test_halo_plan_dense_coupling_falls_back():
    A = random_spd(128, nnz_per_row=23, seed=0)  # random cols: halo > nloc
    plan = build_halo_plan(A, 8, jnp.float64)
    assert plan.needs_all_gather


def test_dist_cg_halo_matches_all_gather(mesh8):
    A = poisson_2d(16)
    b = make_rhs(A.nrows)
    halo = DistributedCg(A, mesh8, rtol=1e-10, strategy="halo")
    gath = DistributedCg(A, mesh8, rtol=1e-10, strategy="all_gather")
    rh, rg = halo.solve(b), gath.solve(b)
    assert rh.extra["strategy"] == "halo" and rg.extra["strategy"] == "all_gather"
    assert rh.converged and rg.converged
    np.testing.assert_allclose(rh.x, rg.x, rtol=1e-8, atol=1e-10)


def test_dist_cg_auto_picks_halo_after_rcm(mesh8):
    A = random_spd(256, nnz_per_row=7, seed=4)
    A = A.permuted(rcm_ordering(A))
    s = DistributedCg(A, mesh8, rtol=1e-9, strategy="auto")
    res = s.solve(make_rhs(256))
    assert res.converged
    rr = np.linalg.norm(make_rhs(256) - A.matvec(res.x)) / np.linalg.norm(make_rhs(256))
    assert rr < 1e-8


def test_dist_cg_halo_impossible_raises(mesh8):
    A = random_spd(128, nnz_per_row=23, seed=0)
    with pytest.raises(ValueError, match="halo"):
        DistributedCg(A, mesh8, strategy="halo")
