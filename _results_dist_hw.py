"""Distributed solve paths on real TPU hardware (VERDICT r2 item 1).

Runs the full shard_map/halo/Pallas-BSR plumbing on a 1-device mesh on the
real chip (the reference's timed device solve loop role, cusparse.c:181-197)
and compares per-iteration cost against the single-chip cg_ir kernel.

    python _results_dist_hw.py > _results_dist_hw.jsonl

Each line: one JSON record (run_bench protocol: warmup + timed trials with
host-transfer fences).
"""

import json
import sys
import time

import numpy as np

from lsbench_tpu.harness.bench import run_bench
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.parallel.mesh import make_row_mesh

MATRIX = "/root/reference/tests/xn3b_A_10.txt"
TRIALS = 20


def bench(tag, make_solver, b, trials=TRIALS, **rb_kw):
    t0 = time.perf_counter()
    try:
        solver = make_solver()
    except Exception as e:  # noqa: BLE001 — record and continue
        print(json.dumps({"tag": tag, "error": repr(e)}), flush=True)
        return
    setup_s = time.perf_counter() - t0
    try:
        rec = run_bench(solver, b, trials=trials, warmups=2,
                        matrix_name=MATRIX, setup_s=setup_s, **rb_kw)
        d = rec.to_json()
        d["tag"] = tag
        d["per_iter_us"] = (rec.solve_s / max(rec.iters, 1)) * 1e6
        print(json.dumps(d), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"tag": tag, "error": repr(e)}), flush=True)


def main():
    A = read_matrix(MATRIX)
    b = np.arange(A.nrows, dtype=np.float64)
    mesh = make_row_mesh(1)

    from lsbench_tpu.solvers.base import get_solver

    def mk_cg_ir():
        cls, params = get_solver("cg_ir")
        return cls(A, rtol=1e-10, ordering="rcm", **params)

    bench("cg_ir_single", mk_cg_ir, b, ordering="rcm")

    from lsbench_tpu.parallel.dist_cg_ir import DistributedCgIr

    bench("dist_cg_ir_1dev",
          lambda: DistributedCgIr(A, mesh, rtol=1e-10, ordering="rcm"),
          b, ordering="rcm")

    from lsbench_tpu.parallel.dist_cg import DistributedCg

    bench("dist_cg_fp64_1dev",
          lambda: DistributedCg(A, mesh, dtype="float64", rtol=1e-10,
                                ordering="rcm"),
          b, ordering="rcm")

    from lsbench_tpu.parallel.dist_amg import DistributedAmg, DistributedAmgCg

    # hypre alias fixed-cycle protocol over the mesh (hypre.c:129,185-186)
    # with the alias's tuned internals (solvers/__init__.py) — the raw
    # AmgOptions defaults do not contract on this SEM workload
    # (RESULTS.md §1).
    hypre_kw = dict(coarsening="classical", theta=0.5, interp="jacobi",
                    degree=3, pre_sweeps=2, post_sweeps=2)
    bench("dist_amg_2cycles_1dev",
          lambda: DistributedAmg(A, mesh, cycles=2, dtype="float32",
                                 **hypre_kw),
          b)

    # rtol 1e-6: the dist AMG-CG iterates in f32 (the recursive residual
    # departs the true one below ~1e-6 in f32; the single-chip production
    # path wraps it in IR — RESULTS.md §5).
    bench("dist_amg_cg_1dev",
          lambda: DistributedAmgCg(A, mesh, rtol=1e-6, dtype="float32",
                                   coarsening="classical", theta=0.25),
          b)

    from lsbench_tpu.parallel.dist_amg import DistributedAmgCgIr

    # Honest 1e-10 distributed AMG: f32 AMG-CG inner + df64 refinement.
    bench("dist_amg_cg_ir_1dev",
          lambda: DistributedAmgCgIr(A, mesh, rtol=1e-10,
                                     coarsening="classical", theta=0.5,
                                     interp="jacobi", interp_passes=3,
                                     interp_omega=0.5, pmax=8),
          b)

    # Round 4: the ginkgo role over a mesh with fp64 semantics — f32
    # BiCGSTAB inner + df64 refinement (VERDICT r3 next 3's hardware row).
    from lsbench_tpu.parallel.dist_cg_ir import DistributedBicgstabIr

    bench("dist_bicgstab_ir_1dev",
          lambda: DistributedBicgstabIr(A, mesh, rtol=1e-10,
                                        ordering="rcm"),
          b, ordering="rcm")

    # Shared-subspace vs simultaneous block CG, k=8 (VERDICT r2 item 4).
    from lsbench_tpu.solvers.block_cg import BlockCgSolver

    rng = np.random.default_rng(0)
    B8 = np.column_stack([b] + [rng.standard_normal(A.nrows)
                                for _ in range(7)])
    for method in ("shared", "simultaneous"):
        bench(f"block_cg_{method}_k8",
              lambda m=method: BlockCgSolver(A, rtol=1e-10, ordering="rcm",
                                             method=m),
              B8, ordering="rcm")


if __name__ == "__main__":
    sys.exit(main())
