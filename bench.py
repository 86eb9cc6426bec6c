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
statistics. SpMV timed as a chained x -> A@x loop inside one jit (at this
size per-dispatch latency would otherwise dominate), matching how SpMV
appears inside Krylov iterations. CG time-to-solution uses the flagship
mixed-precision mode (f32 Pallas inner CG + f64 refinement to relres 1e-10,
the reference's direct-solve tolerance, cusparse.c:184).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_MATRIX = "/root/reference/tests/xn3b_A_10.txt"


def _timed_chain(fn, x0, chain, reps=5):
    @jax.jit
    def chained(x):
        def body(_, v):
            y = fn(v)
            return y / jnp.max(jnp.abs(y))
        return jax.lax.fori_loop(0, chain, body, x)

    jax.block_until_ready(chained(x0))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x0))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2] / chain


def main():
    from lsbench_tpu.matrix.bsr import BsrMatrix
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

    # Native path: Pallas BSR kernel (f32), RCM-densified blocks.
    bsr = BsrMatrix.from_csr(A)
    t_pallas = _timed_chain(lambda v: spmv_bsr(bsr, v), x0, chain=200)

    # Port-equivalent baseline: XLA gather ELL SpMV (same math, same chip).
    ell32 = EllMatrix.from_csr(A, dtype=jnp.float32)
    t_gather = _timed_chain(lambda v: spmv_ell(ell32, v), x0, chain=50, reps=3)

    gnnz_s = A.nnz / t_pallas / 1e9

    # CG time-to-solution, mixed precision, reference RHS r[i]=i and the
    # reference direct tolerance 1e-10.
    cls, params = get_solver("cg_ir")
    solver = cls(A0, rtol=1e-10, ordering="rcm", **params)
    b = np.arange(n, dtype=np.float64)
    fn = solver.solve_fn()
    jax.block_until_ready(fn(b))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(b))
    cg_s = time.perf_counter() - t0
    res = solver.solve(b)

    print(json.dumps({
        "metric": f"spmv_f32_nnz_per_s[{matrix_name}]",
        "value": round(gnnz_s, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(t_gather / t_pallas, 2),
        "details": {
            "pallas_spmv_us": round(t_pallas * 1e6, 2),
            "xla_gather_spmv_us": round(t_gather * 1e6, 2),
            "cg_fp32ir_solve_s": round(cg_s, 4),
            "cg_iters": res.iters,
            "cg_relres": res.relres,
            "cg_converged": res.converged,
            "n": n, "nnz": A.nnz,
            "device": str(jax.devices()[0].device_kind),
        },
    }))


if __name__ == "__main__":
    main()
