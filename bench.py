#!/usr/bin/env python
"""Headline benchmark: steady-state SpMV throughput + CG time-to-solution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
reported against the physics baseline instead: the HBM-bandwidth roofline
for ELL SpMV on this chip (values+cols streamed once per multiply).
vs_baseline = achieved / roofline, i.e. roofline utilization (1.0 = speed of
light).

Protocol: the reference workload matrix (tests/xn3b_A_10.txt) when present,
else a synthetic SPD matrix with the same nnz/row statistics. SpMV is timed
as a chained x -> A@x loop inside one jit (amortizing dispatch, which at
nnz≈146k would otherwise dominate), matching how SpMV appears inside real
Krylov iterations.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_MATRIX = "/root/reference/tests/xn3b_A_10.txt"

# Per-chip HBM bandwidth for the roofline denominator, by TPU generation.
HBM_GBPS = {
    "v5e": 819.0, "v5 lite": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6e": 1640.0, "v6 lite": 1640.0,
}


def detect_hbm_gbps() -> float:
    kind = (jax.devices()[0].device_kind or "").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def main():
    from lsbench_tpu.matrix.ell import EllMatrix
    from lsbench_tpu.matrix.generate import random_spd
    from lsbench_tpu.matrix.io import read_matrix
    from lsbench_tpu.ops.spmv import spmv_ell
    from lsbench_tpu.solvers.base import get_solver

    if os.path.exists(REF_MATRIX):
        A = read_matrix(REF_MATRIX)
        matrix_name = os.path.basename(REF_MATRIX)
    else:
        A = random_spd(6408, nnz_per_row=23, seed=0)
        matrix_name = "synthetic_spd_6408"

    dtype = jnp.float32  # the TPU-fast path; f64 measured in extended bench
    ell = EllMatrix.from_csr(A, dtype=dtype, row_align=8)
    n = A.nrows

    chain = 200  # SpMVs per timed program

    @jax.jit
    def spmv_chain(x):
        def body(_, v):
            y = spmv_ell(ell, v)
            # Cheap normalization keeps values finite across the chain.
            return y / jnp.max(jnp.abs(y))
        return jax.lax.fori_loop(0, chain, body, x)

    x0 = jnp.asarray(np.random.default_rng(0).random(n), dtype=dtype)
    jax.block_until_ready(spmv_chain(x0))  # compile + warm

    reps = 5
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = spmv_chain(x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    spmv_s = dt / (reps * chain)
    gnnz_s = A.nnz / spmv_s / 1e9

    # Roofline: stream vals (4B) + cols (4B) per stored entry once; x and y
    # live in cache/VMEM at this size.
    bytes_per_nnz = 8.0
    roofline_gnnz_s = detect_hbm_gbps() / bytes_per_nnz

    # Secondary: CG time-to-solution at rtol 1e-8 (fp64 semantics).
    cls, params = get_solver("cg")
    solver = cls(A, dtype=jnp.float64, rtol=1e-8, **params)
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
        "vs_baseline": round(gnnz_s / roofline_gnnz_s, 4),
        "details": {
            "spmv_us": round(spmv_s * 1e6, 2),
            "roofline_gnnz_s": round(roofline_gnnz_s, 1),
            "cg_fp64_solve_s": round(cg_s, 4),
            "cg_iters": res.iters,
            "cg_relres": res.relres,
            "n": n, "nnz": A.nnz,
            "device": str(jax.devices()[0].device_kind),
        },
    }))


if __name__ == "__main__":
    main()
