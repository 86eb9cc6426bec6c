"""Distributed mixed-precision CG (f32 inner + f64 refinement) on the
simulated 8-device mesh — the production fp64 solve mode over a mesh
(parallel/dist_cg_ir.py), plus the host-side ordering round-trip every
1-D distributed solver now supports (cusparse.c:66-96 role)."""

import numpy as np
import pytest

from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.parallel.dist_cg_ir import DistributedCgIr
from lsbench_tpu.parallel.mesh import make_row_mesh

REF = "/root/reference/tests/xn3b_A_18.txt"


@pytest.fixture(scope="module")
def A():
    return read_matrix(REF)


@pytest.fixture(scope="module")
def mesh():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    return make_row_mesh(8)


def _true_relres(A, x, b):
    return (np.linalg.norm(b - A.matvec(np.asarray(x, np.float64)))
            / np.linalg.norm(b))


def test_dist_cg_ir_reaches_direct_tolerance(A, mesh):
    b = np.arange(A.nrows, dtype=np.float64)
    s = DistributedCgIr(A, mesh, rtol=1e-10)
    res = s.solve(b)
    assert res.converged
    assert res.extra["refine_passes"] <= 4
    assert res.extra["precision_mode"] == "fp32_ir_auto"
    assert _true_relres(A, res.x, b) <= 1e-10


def test_dist_cg_ir_matches_single_device(A):
    """Golden equality across mesh sizes (the race-check role,
    SURVEY.md §4 item 3): same x and same refinement structure."""
    import jax
    b = np.arange(A.nrows, dtype=np.float64)
    xs, passes = [], []
    for ndev in (1, 8):
        if len(jax.devices()) < ndev:
            pytest.skip("needs 8 simulated devices")
        s = DistributedCgIr(A, make_row_mesh(ndev), rtol=1e-10)
        res = s.solve(b)
        xs.append(np.asarray(res.x, np.float64))
        passes.append(res.extra["refine_passes"])
    # Both converged to 1e-10: agreement to that level (collectives
    # reorder f32 sums, so bitwise equality is not expected).
    nb = np.linalg.norm(xs[0])
    assert np.linalg.norm(xs[0] - xs[1]) / nb < 1e-9


def test_dist_cg_ir_ordering_roundtrip(A, mesh):
    """RCM inside the solver must be invisible outside: same solution
    as ordering='none', in the original numbering."""
    b = np.arange(A.nrows, dtype=np.float64)
    x_none = DistributedCgIr(A, mesh, rtol=1e-10, ordering="none").solve(b).x
    res = DistributedCgIr(A, mesh, rtol=1e-10, ordering="rcm").solve(b)
    assert _true_relres(A, res.x, b) <= 1e-10
    nb = np.linalg.norm(np.asarray(x_none))
    assert (np.linalg.norm(np.asarray(res.x) - np.asarray(x_none)) / nb
            < 1e-9)


def test_dist_cg_ir_bsr_equals_ell(A):
    """Pallas BSR (interpret mode on CPU) vs the jnp ELL local SpMV
    inside the SAME dist CG-IR structure.

    Tolerance note: under the test lane's forced-8-host-device XLA flag,
    pallas INTERPRET mode compiles the double-float kernel's compensated
    f32 arithmetic differently and its accuracy drops from ~1e-15 to
    ~1e-8 relative (verified: the identical TwoProd/TwoSum math in plain
    jnp stays exact under the same flag, and without the flag the
    interpret kernel is exact too). Hardware is unaffected — the tpu
    lane asserts the df64 kernel at 1e-13 (test_spmv_df64_hw) and the
    distributed CG-IR at 1e-10 (test_dist_cg_ir_1dev_hw) — so this test
    checks the PLUMBING equality at the simulator-achievable tolerance
    (one refinement pass deep, rtol 1e-4)."""
    mesh2 = make_row_mesh(2)
    b = np.arange(A.nrows, dtype=np.float64)
    out = {}
    for spmv in ("ell", "bsr"):
        s = DistributedCgIr(A, mesh2, rtol=1e-4, ordering="rcm",
                            local_spmv=spmv)
        assert s.local_spmv == spmv
        res = s.solve(b)
        assert _true_relres(A, res.x, b) <= 1e-4
        out[spmv] = np.asarray(res.x, np.float64)
    nb = np.linalg.norm(out["ell"])
    assert np.linalg.norm(out["ell"] - out["bsr"]) / nb < 1e-3


def test_dist_cg_ordering_roundtrip(A, mesh):
    from lsbench_tpu.parallel.dist_cg import DistributedCg
    b = np.arange(A.nrows, dtype=np.float64)
    res = DistributedCg(A, mesh, dtype="float64", rtol=1e-10,
                        ordering="rcm").solve(b)
    assert _true_relres(A, res.x, b) <= 1e-9


def test_dist_bicgstab_ordering_roundtrip(A, mesh):
    from lsbench_tpu.parallel.dist_bicgstab import DistributedBicgstab
    b = np.arange(A.nrows, dtype=np.float64)
    res = DistributedBicgstab(A, mesh, dtype="float64", rtol=1e-8,
                              ordering="rcm").solve(b)
    assert _true_relres(A, res.x, b) <= 1e-7


def test_dist_gmres_ordering_roundtrip(A, mesh):
    from lsbench_tpu.parallel.dist_gmres import DistributedGmres
    b = np.arange(A.nrows, dtype=np.float64)
    res = DistributedGmres(A, mesh, dtype="float64", rtol=1e-8,
                           ordering="rcm").solve(b)
    assert _true_relres(A, res.x, b) <= 1e-7


def test_cli_devices_1_runs_mesh_path(capsys):
    """--devices 1 (explicitly given) must run the full shard_map mesh
    plumbing, not the single-chip solver (VERDICT r2 item 1)."""
    import json

    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "cg_ir", "--devices", "1",
               "--trials", "2", "--json", "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["solver"] == "cg_ir"
    assert rec["refine_passes"] >= 1       # DistributedCgIr's record
    assert rec["strategy"] in ("halo", "all_gather")
    assert rec["true_relres"] <= 1e-9


def test_cli_devices_passes_ordering(capsys):
    import json

    from lsbench_tpu.harness.cli import main
    rc = main(["--matrix", REF, "--solver", "cg", "--devices", "2",
               "--ordering", "rcm", "--precision", "fp32",
               "--rtol", "1e-6", "--trials", "1", "--json",
               "--platform", "cpu"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["ordering"] == "rcm"
    assert rec["true_relres"] <= 1e-4
