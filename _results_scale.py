"""Regenerate RESULTS.md §4: beyond-reference-scale TPU runs.

The reference workload tops out at n=6,408 / nnz=146k (SURVEY §2.1). This
section shows the framework at production sizes on one chip:
  - Pallas BSR SpMV throughput on a 2-D Poisson operator at n=262k
    (RCM-banded; the padded layout's economics at 5 nnz/row are reported
    honestly via streamed bytes),
  - AMG-preconditioned CG-IR (the production pressure-solve path) at the
    same size,
  - device-side blocked band Cholesky factor+solve at n≈50k.

Run on the TPU rig: python _results_scale.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def jnp_max_abs(y):
    import jax.numpy as jnp
    return jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)


def slope_time(fn, x0, c1, c2, reps=3, args=()):
    """Median wall-seconds per step via two chain lengths (removes the
    ~30 ms remote-tunnel dispatch latency — bench.py's method). Operands
    ride as jit ARGUMENTS via `args` — closing over a large operand bakes
    it into the jaxpr as a constant and the remote-compile request body
    blows the tunnel's size limit (HTTP 413)."""
    import jax

    def chain_wall(chain):
        def chained(a, v):
            def body(_, u):
                y = fn(a, u)
                return y / jnp_max_abs(y)
            return jax.lax.fori_loop(0, chain, body, v)
        ch = jax.jit(chained)
        # Completion fence = host transfer, NOT block_until_ready: through
        # the remote-TPU tunnel block_until_ready can return before the
        # work is done (bench.py documents the same trap), which zeroes
        # the slope.
        np.asarray(ch(args, x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(ch(args, x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    w1, w2 = chain_wall(c1), chain_wall(c2)
    return max((w2 - w1) / (c2 - c1), 1e-12)


def main():
    import jax
    import jax.numpy as jnp

    from lsbench_tpu.matrix.bsr import BsrMatrix
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.ops.spmv_pallas import spmv_bsr
    from lsbench_tpu.ordering.rcm import rcm_ordering

    out = {}

    # ---- 1. SpMV at n=262k (512x512 Poisson), RCM-banded ----
    t0 = time.perf_counter()
    A = poisson_2d(512)                      # n=262,144  nnz~1.3M
    perm = rcm_ordering(A)
    Ap = A.permuted(perm)
    op = BsrMatrix.from_csr(Ap, dtype=jnp.float32)
    setup_s = time.perf_counter() - t0
    x = jnp.asarray(np.random.default_rng(0).random(A.ncols), jnp.float32)
    t = slope_time(lambda a, v: spmv_bsr(a, v).astype(jnp.float32),
                   x, 50, 250, args=op)
    out["spmv_poisson_512"] = {
        "n": A.nrows, "nnz": A.nnz, "spmv_us": t * 1e6,
        "gnnz_per_s": A.nnz / t / 1e9,
        "streamed_MB": op.bytes_streamed / 1e6,
        "hbm_GBps": op.bytes_streamed / t / 1e9,
        "layout_setup_s": setup_s,
    }
    print(json.dumps({"spmv_poisson_512": out["spmv_poisson_512"]}), flush=True)

    # ---- 2. AMG-preconditioned CG-IR at n=262k ----
    from lsbench_tpu.solvers.base import get_solver
    b = np.arange(A.nrows, dtype=np.float64)
    cls, ps = get_solver("cg_ir")
        # Round 5: the production interpolation preset (the r3 damped
    # ideal-interp that the hypre/amgx aliases and --precond
    # amg_classical use — RESULTS §1) nearly QUARTERS the CG iteration
    # count at this scale vs plain direct interpolation (13 vs 57
    # iters, 0.43 vs 0.82 s/solve measured on-chip).
    ps.update(rtol=1e-10, precond="amg",
              precond_params=dict(coarsening="classical", theta=0.25,
                                  interp="jacobi", interp_passes=3,
                                  interp_omega=0.5, pmax=8))
    t0 = time.perf_counter()
    s = cls(A, **ps)
    setup_s = time.perf_counter() - t0
    fn, args = s.solve_fn_args()
    bj = jnp.asarray(b)
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    np.asarray(jitted(args, bj))
    first_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(args, bj))  # host-transfer fence (see slope_time)
        ts.append(time.perf_counter() - t0)
    res = s.solve(b)
    out["amgcg_ir_poisson_512"] = {
        "n": A.nrows, "nnz": A.nnz,
        "solve_s": float(np.median(ts)), "iters": res.iters,
        "relres": res.relres, "converged": bool(res.converged),
        "setup_s": setup_s, "first_call_s": first_s,
        "setup_breakdown": {k: round(v, 2) if isinstance(v, float) else v
                            for k, v in s.setup_breakdown.items()},
    }
    print(json.dumps({"amgcg_ir_poisson_512": out["amgcg_ir_poisson_512"]}),
          flush=True)

    # ---- 2b. AMG-CG-IR on the n=263k IRREGULAR SEM matrix (element
    # cliques, 9/15/25 row-width skew — where class skew and band width
    # actually bite; VERDICT r3 missing 6) ----
    from lsbench_tpu.matrix.generate import sem_2d
    A_sem = sem_2d(256, 2)
    b_sem = np.arange(A_sem.nrows, dtype=np.float64)
    cls, ps = get_solver("cg_ir")
        # Round 5: the production interpolation preset (the r3 damped
    # ideal-interp that the hypre/amgx aliases and --precond
    # amg_classical use — RESULTS §1) nearly QUARTERS the CG iteration
    # count at this scale vs plain direct interpolation (13 vs 57
    # iters, 0.43 vs 0.82 s/solve measured on-chip).
    ps.update(rtol=1e-10, precond="amg",
              precond_params=dict(coarsening="classical", theta=0.25,
                                  interp="jacobi", interp_passes=3,
                                  interp_omega=0.5, pmax=8))
    t0 = time.perf_counter()
    s = cls(A_sem, **ps)
    setup_s = time.perf_counter() - t0
    fn, args = s.solve_fn_args()
    bj = jnp.asarray(b_sem)
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    np.asarray(jitted(args, bj))
    first_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jitted(args, bj))
        ts.append(time.perf_counter() - t0)
    res = s.solve(b_sem)
    true_rel = (np.linalg.norm(b_sem - A_sem.matvec(
        np.asarray(res.x, np.float64))) / np.linalg.norm(b_sem))
    out["amgcg_ir_sem_256"] = {
        "n": A_sem.nrows, "nnz": A_sem.nnz,
        "solve_s": float(np.median(ts)), "iters": res.iters,
        "relres": res.relres, "true_relres": float(true_rel),
        "converged": bool(res.converged),
        "setup_s": setup_s, "first_call_s": first_s,
        "setup_breakdown": {k: round(v, 2) if isinstance(v, float) else v
                            for k, v in s.setup_breakdown.items()},
    }
    print(json.dumps({"amgcg_ir_sem_256": out["amgcg_ir_sem_256"]}),
          flush=True)

    # ---- 3. Band Cholesky at n=50k: device MXU numeric factor ----
    cls, ps = get_solver("cholesky_band")
    A2 = poisson_2d(224)                     # n=50,176
    b2 = np.arange(A2.nrows, dtype=np.float64)
    t0 = time.perf_counter()
    s2 = cls(A2, **ps)
    setup_s = time.perf_counter() - t0
    res2 = s2.solve(b2)
    fn2, args2 = s2.solve_fn_args()
    jit2 = jax.jit(fn2)
    b2j = jnp.asarray(b2)
    np.asarray(jit2(args2, b2j))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jit2(args2, b2j))  # host-transfer fence (see slope_time)
        ts.append(time.perf_counter() - t0)
    out["band_cholesky_50k"] = {
        "n": A2.nrows, "nnz": A2.nnz,
        "setup_s": setup_s, **{k: v for k, v in
                               s2.setup_breakdown.items()},
        "solve_s": float(np.median(ts)),
        "relres": res2.relres, "converged": bool(res2.converged),
    }
    print(json.dumps({"band_cholesky_50k": out["band_cholesky_50k"]}),
          flush=True)


if __name__ == "__main__":
    main()
