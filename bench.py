#!/usr/bin/env python
"""Headline benchmark: Pallas BSR SpMV throughput + CG time-to-solution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` compares
against the in-framework baseline the reference's design would give on TPU:
XLA's gather-based ELL SpMV (what a straight port of CSR SpMV lowers to).
vs_baseline = gather_spmv_time / pallas_spmv_time (higher is better; >1
means the native kernel beats the port-equivalent path).

Workload: the reference benchmark matrix tests/xn3b_A_10.txt when present
(largest shipped), else a synthetic SPD matrix with the same nnz/row
statistics. SpMV is timed as the SLOPE over two chained x -> A@x loop
lengths inside single jits: wall(chain) = dispatch_latency + chain * t_spmv,
so differencing removes the dispatch latency (~30 ms through the remote-TPU
tunnel — it would otherwise dominate at these sizes). CG time-to-solution
uses the flagship mixed-precision mode (f32 Pallas inner CG + f64
refinement to relres 1e-10, the reference's direct-solve tolerance,
cusparse.c:184).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_MATRIX = "/root/reference/tests/xn3b_A_10.txt"


def _chain_wall(fn, x0, chain, reps=3, args=()):
    """Median wall-clock of ONE dispatch of `chain` dependent fn steps.

    `args` are device operands passed THROUGH the jit as arguments — a
    closure would embed them as HLO literal constants, and the remote-TPU
    compile tunnel rejects programs past ~100 MB (HTTP 413; hit by the
    164 MB dense-inverse operand of the cholmod solver)."""
    @jax.jit
    def chained(args, x):
        def body(_, v):
            y = fn(args, v)
            return y / jnp.max(jnp.abs(y))
        return jax.lax.fori_loop(0, chain, body, x)

    # Completion fence = host transfer of the result, NOT block_until_ready:
    # through the remote-TPU tunnel block_until_ready has been observed to
    # return before the work is done (a 200-step chain "completing" in
    # 0.09 ms), which zeroed the slope. np.asarray round-trips the (small)
    # result vector and is reliably synchronous.
    np.asarray(chained(args, x0))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(args, x0))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def _slope_timed(fn, x0, c1, c2, reps=3, args=()):
    """Per-step time as the slope over two chain lengths (removes the
    per-dispatch latency), plus the inferred dispatch intercept."""
    w1 = _chain_wall(fn, x0, c1, reps, args=args)
    w2 = _chain_wall(fn, x0, c2, reps, args=args)
    slope = max((w2 - w1) / (c2 - c1), 1e-12)
    intercept = max(w1 - slope * c1, 0.0)
    return slope, intercept


def main():
    from lsbench_tpu.matrix.bsr import BsrMatrix
    from lsbench_tpu.utils import host_fence
    from lsbench_tpu.matrix.ell import EllMatrix
    from lsbench_tpu.matrix.generate import random_spd
    from lsbench_tpu.matrix.io import read_matrix
    from lsbench_tpu.ops.spmv import spmv_ell
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr
    from lsbench_tpu.ordering.rcm import rcm_ordering
    from lsbench_tpu.solvers.base import get_solver

    if os.path.exists(REF_MATRIX):
        A0 = read_matrix(REF_MATRIX)
        matrix_name = os.path.basename(REF_MATRIX)
    else:
        A0 = random_spd(6408, nnz_per_row=23, seed=0)
        matrix_name = "synthetic_spd_6408"

    A = A0.permuted(rcm_ordering(A0))
    n = A.nrows
    x0 = jnp.asarray(np.random.default_rng(0).random(n), dtype=jnp.float32)

    # Native path: Pallas BSR kernel (f32), RCM-densified blocks. Operands
    # ride as jit ARGUMENTS (see _chain_wall).
    bsr = BsrMatrix.from_csr(A)
    t_pallas, disp = _slope_timed(lambda a, v: spmv_bsr(a, v), x0, 200, 1200,
                                  args=bsr)

    # Port-equivalent baseline: XLA gather ELL SpMV (same math, same chip).
    ell32 = EllMatrix.from_csr(A, dtype=jnp.float32)
    t_gather, _ = _slope_timed(lambda a, v: spmv_ell(a, v), x0, 10, 60,
                               args=ell32)

    # FP64 path: double-float Pallas kernel (the reference's enforced
    # precision, lsbench.c:140-141, at ~2^-49 accuracy).
    from lsbench_tpu.matrix.bsr import BsrDf64
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr_df64
    df = BsrDf64.from_csr(A)
    x64 = jnp.asarray(np.random.default_rng(1).random(n))
    t_df64, _ = _slope_timed(lambda a, v: spmv_bsr_df64(a, v), x64, 100, 500,
                             args=df)

    gnnz_s = A.nnz / t_pallas / 1e9

    # Multi-RHS SpMM (k=8): same streamed blocks, MXU dot_general per
    # slot — the k RHS ride the SpMV's HBM traffic, so effective nnz/s
    # should approach k x the SpMV rate (ops/spmv_pallas.py::spmm_bsr).
    from lsbench_tpu.ops.spmv_pallas import spmm_bsr
    K_RHS = 8
    X0 = jnp.asarray(np.random.default_rng(2).random((n, K_RHS)),
                     dtype=jnp.float32)
    t_spmm, _ = _slope_timed(lambda a, V: spmm_bsr(a, V), X0, 100, 600,
                             args=bsr)

    # Solver time-to-solution, slope-timed like the SpMV (the ~30 ms
    # remote-tunnel dispatch would otherwise swamp the device time).
    # Chained solves stay unfoldable because each step's rhs depends
    # SYMBOLICALLY on the previous solution under jit (the 1e-14 scale
    # keeps the numeric effect below the iteration-count threshold; for
    # most entries of b it rounds to no change at all, which is fine —
    # the dependence XLA sees is structural, not numerical).
    def _solve_slope(solver, b, c1=1, c2=5):
        b = jnp.asarray(b)
        fn, fargs = solver.solve_fn_args()

        def step(args, v):
            return fn(args, b + 1e-14 * v).astype(b.dtype)

        return _slope_timed(step, jnp.zeros_like(b), c1, c2, args=fargs)[0]

    b = np.arange(n, dtype=np.float64)

    # (a) Mixed-precision CG (f32 Pallas inner + f64 refinement) at the
    # reference direct tolerance 1e-10 (cusparse.c:184), RHS r[i]=i.
    cls, params = get_solver("cg_ir")
    solver = cls(A0, rtol=1e-10, ordering="rcm", **params)
    cg_s = _solve_slope(solver, b)
    res = solver.solve(b)

    # (b) The reference's DEFAULT protocol: CHOLMOD factor-once, timed
    # repeated solves (cholmod-impl.h:44-63) — here f32 explicit-inverse
    # GEMV + double-float residual refinement to 1e-10.
    ccls, cparams = get_solver("cholmod")
    csolver = ccls(A0, **cparams)
    chol_s = _solve_slope(csolver, b)
    cres = csolver.solve(b)

    # (c) Shared-subspace block CG, k=8 (one block-Krylov space for all
    # columns — fewer block iterations than ONE single-RHS solve) and
    # (d) the distributed path on a 1-device mesh (full shard_map/halo/
    # Pallas-BSR plumbing). Guarded: the headline metric must survive
    # any regression here.
    extra = {}
    try:
        from lsbench_tpu.solvers.block_cg import BlockCgSolver
        rng8 = np.random.default_rng(3)
        B8 = np.column_stack(
            [b] + [rng8.standard_normal(n) for _ in range(7)])
        bsolver = BlockCgSolver(A0, rtol=1e-10, ordering="rcm")
        bres = bsolver.solve(B8)
        fn8 = bsolver.solve_fn()
        host_fence(fn8(B8))
        host_fence(fn8(B8))
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = fn8(B8)
        host_fence(out)
        blk_s = (time.perf_counter() - t0) / 10
        extra["block_cg_shared_k8_solve_ms"] = round(blk_s * 1e3, 2)
        extra["block_cg_shared_k8_per_rhs_ms"] = round(blk_s * 1e3 / 8, 2)
        extra["block_cg_shared_k8_iters"] = bres.iters
    except Exception as e:  # noqa: BLE001
        extra["block_cg_shared_k8_error"] = repr(e)[:200]
    try:
        from lsbench_tpu.parallel.dist_cg_ir import DistributedCgIr
        from lsbench_tpu.parallel.mesh import make_row_mesh
        dsolver = DistributedCgIr(A0, make_row_mesh(1), rtol=1e-10,
                                  ordering="rcm")
        dres = dsolver.solve(b)
        dfn = dsolver.solve_fn()
        host_fence(dfn(b))
        host_fence(dfn(b))
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = dfn(b)
        host_fence(out)
        dist_s = (time.perf_counter() - t0) / 10
        extra["dist_cg_ir_1dev_solve_ms"] = round(dist_s * 1e3, 2)
        extra["dist_cg_ir_1dev_per_iter_us"] = round(
            dist_s / max(dres.iters, 1) * 1e6, 1)
        extra["dist_cg_ir_1dev_true_relres"] = float(
            np.linalg.norm(b - A0.matvec(np.asarray(dres.x, np.float64)))
            / np.linalg.norm(b))
    except Exception as e:  # noqa: BLE001
        extra["dist_cg_ir_1dev_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": f"spmv_f32_nnz_per_s[{matrix_name}]",
        "value": round(gnnz_s, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(t_gather / t_pallas, 2),
        "details": {
            "pallas_spmv_us": round(t_pallas * 1e6, 2),
            "xla_gather_spmv_us": round(t_gather * 1e6, 2),
            "df64_spmv_us": round(t_df64 * 1e6, 2),
            "df64_gnnz_per_s": round(A.nnz / t_df64 / 1e9, 3),
            "spmm_k8_us": round(t_spmm * 1e6, 2),
            "spmm_k8_eff_gnnz_per_s": round(K_RHS * A.nnz / t_spmm / 1e9, 3),
            "hbm_gb_per_s": round(bsr.bytes_streamed / t_pallas / 1e9, 1),
            "dispatch_latency_ms": round(disp * 1e3, 1),
            "cg_fp32ir_solve_s": round(cg_s, 5),
            "cg_iters": res.iters,
            "cg_relres": res.relres,
            "cg_converged": res.converged,
            "cholmod_solve_ms": round(chol_s * 1e3, 3),
            "cholmod_relres": cres.relres,
            **extra,
            "n": n, "nnz": A.nnz,
            "device": str(jax.devices()[0].device_kind),
        },
    }))


if __name__ == "__main__":
    main()
