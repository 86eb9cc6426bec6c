"""Distributed mixed-precision CG: f32 inner dist-CG + f64 refinement.

The distributed twin of solvers/refine.py::CgIrSolver, and the production
fp64 solve mode over a mesh: TPU f64 is emulated, so running every CG
iteration in f64 (or double-float) pays ~2-3x per matvec. Instead:

- the inner CG iterates entirely in f32 on the halo-exchange Pallas BSR
  path (parallel/dist_spmv.py), one fused `psum` per iteration;
- once per refinement pass, the f64 residual r = b - A x is computed with
  the double-float Pallas kernel (hi+lo block pair, ~2^-49) and reduced
  with one more psum;
- each pass gains ~6 digits; 2-3 passes reach the reference's direct
  tolerance 1e-10 (cusparse.c:184) at f32 per-iteration cost.

Everything (outer refinement while_loop + inner CG while_loop) runs in ONE
shard_map/jit program — no host round-trips between passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.parallel.dist_spmv import (build_dist_matvec,
                                            fused_psum)
from lsbench_tpu.parallel.mesh import ROWS, fetch_global
from lsbench_tpu.parallel.perm import resolve_dist_ordering
from lsbench_tpu.solvers.base import SolveResult, Solver


class DistributedCgIr(Solver):
    """f32 distributed CG inner solve + f64 distributed residual refinement.

    The `--devices N` route for `--solver cg_ir` / `--precision fp32_ir`
    (and the recommended fp64 production path over a mesh).
    """

    name = "dist_cg_ir"

    def __init__(self, A: CsrMatrix, mesh: Mesh, rtol=1e-10, inner_rtol=1e-5,
                 maxiter=None, max_refine=6, ordering="none",
                 strategy="auto", local_spmv="auto", row_align: int = 8,
                 dtype=None, **params):
        super().__init__(A, **params)
        del dtype  # precision structure is fixed: f32 inner / f64 outer
        A, self._ord = resolve_dist_ordering(A, ordering)
        self.mesh = mesh
        self.rtol = float(rtol)
        self.inner_rtol = float(inner_rtol)
        self.maxiter = (int(maxiter) if maxiter is not None
                        else max(10 * A.nrows, 1000))
        self.max_refine = int(max_refine)
        self.n = A.nrows

        # Same partition for both operators (nloc depends only on
        # n / n_devices / row_align): f32 for the inner iteration, f64
        # (double-float BSR on TPU, f64 ELL elsewhere) for the residual.
        dm32 = build_dist_matvec(A, mesh, jnp.float32, strategy=strategy,
                                 local_spmv=local_spmv, row_align=row_align)
        dm64 = build_dist_matvec(A, mesh, jnp.float64, strategy=dm32.strategy,
                                 local_spmv=dm32.local_spmv,
                                 row_align=row_align)
        assert dm32.n_pad == dm64.n_pad and dm32.nloc == dm64.nloc
        self.strategy = dm32.strategy
        self.local_spmv = dm32.local_spmv
        self.plan = dm32.plan
        self.n_pad = dm32.n_pad

        vec_shard = NamedSharding(mesh, P(ROWS))
        self.vec_shard = vec_shard

        # Jacobi preconditioner for the f32 inner iteration.
        d = np.ones(self.n_pad)
        diag = A.diagonal()
        d[: self.n] = np.where(diag != 0.0, diag, 1.0)
        inv_diag = jax.device_put(jnp.asarray(1.0 / d, dtype=jnp.float32),
                                  vec_shard)

        rtol_c, inner_rtol_c = self.rtol, self.inner_rtol
        maxiter_c, max_refine_c = self.maxiter, self.max_refine
        mv32_local, mv64_local = dm32.matvec, dm64.matvec
        n32 = len(dm32.op_specs)

        @partial(shard_map, mesh=mesh,
                 in_specs=(*dm32.op_specs, *dm64.op_specs, P(ROWS), P(ROWS)),
                 out_specs=(P(ROWS), P(), P(), P(), P()),
                 check_vma=dm32.check_vma and dm64.check_vma)
        def _solve(*args):
            op32_l = tuple(args[:n32])
            op64_l = tuple(args[n32:-2])
            invd_l, b_l = args[-2:]


            def cg_inner(rhs_l):
                """f32 Jacobi-CG of A d = rhs to inner_rtol (relative)."""
                (bb,) = fused_psum(jnp.vdot(rhs_l, rhs_l))
                tol2 = jnp.asarray(inner_rtol_c**2, jnp.float32) * bb
                x0 = jnp.zeros_like(rhs_l)
                z0 = invd_l * rhs_l
                rz0, rr0 = fused_psum(jnp.vdot(rhs_l, z0),
                                      jnp.vdot(rhs_l, rhs_l))

                def cond(s):
                    *_, rr, it = s
                    return jnp.logical_and(it < maxiter_c, rr > tol2)

                def body(s):
                    x, r, p, rz, rr, it = s
                    Ap = mv32_local(op32_l, p)
                    (pAp,) = fused_psum(jnp.vdot(p, Ap))
                    alpha = rz / pAp
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = invd_l * r
                    rz_new, rr_new = fused_psum(jnp.vdot(r, z),
                                                jnp.vdot(r, r))
                    beta = rz_new / rz
                    p = z + beta * p
                    return (x, r, p, rz_new, rr_new, it + 1)

                x, r, p, rz, rr, it = jax.lax.while_loop(
                    cond, body, (x0, rhs_l, z0, rz0, rr0, jnp.int32(0)))
                return x, it

            b_l = b_l.astype(jnp.float64)
            (bb,) = fused_psum(jnp.vdot(b_l, b_l))
            tol2 = (rtol_c**2) * bb

            def refine_cond(s):
                x, r, rr, it_total, passes = s
                return jnp.logical_and(passes < max_refine_c, rr > tol2)

            def refine_body(s):
                # One f64 (double-float) SpMV per PASS, not per iteration
                # — the residual carries across passes.
                x, r, rr, it_total, passes = s
                scale = jnp.sqrt(rr)
                safe = jnp.where(scale > 0, scale, 1.0)
                rhs32 = (r.astype(jnp.float32)
                         * (1.0 / safe).astype(jnp.float32))
                d32, inner_iters = cg_inner(rhs32)
                # A non-finite correction (f32 breakdown) must not poison
                # x; drop it and let the pass cap end the loop.
                d32 = jnp.where(jnp.isfinite(d32), d32, 0.0)
                x = x + (d32 * safe.astype(jnp.float32)).astype(jnp.float64)
                r_new = b_l - mv64_local(op64_l, x)
                (rr_new,) = fused_psum(jnp.vdot(r_new, r_new))
                return (x, r_new, rr_new, it_total + inner_iters, passes + 1)

            x0 = jnp.zeros_like(b_l)
            x, r, rr, iters, passes = jax.lax.while_loop(
                refine_cond, refine_body,
                (x0, b_l, bb, jnp.int32(0), jnp.int32(0)))
            return x, jnp.sqrt(rr), jnp.sqrt(bb), iters, passes

        inner = jax.jit(_solve)

        # Device-side ordering: the b-permutation and x-inverse-permutation
        # ride INSIDE the jitted program as sharded gathers (one per SOLVE
        # — on N>1 devices XLA inserts the one-time resharding collective,
        # never in the iteration loop). Besides moving the permute off the
        # host, this gather-wrapped nested-while program is exactly the
        # shape for which XLA's memory-space assignment keeps the Pallas
        # BSR blocks VMEM-RESIDENT across inner iterations — measured
        # 22.8 vs 64.2 µs/iter on a 1-device mesh, i.e. the distributed
        # per-iteration cost matches the single-chip flagship instead of
        # sitting at the HBM roofline (DESIGN.md §3 "VMEM residency";
        # pinned by test_dist_cg_ir_1dev_hw). The indices are runtime
        # ARGUMENTS (not baked constants) so the identity ordering keeps
        # the same program shape.
        shard = vec_shard

        @jax.jit
        def _solve_wrapped(*args):
            *op_and_state, pp_i, ip_i, braw = args
            bp = braw.at[pp_i].get(out_sharding=shard)
            x, rnorm, bnorm, iters, passes = inner(*op_and_state, bp)
            return (x.at[ip_i].get(out_sharding=shard),
                    rnorm, bnorm, iters, passes)

        pp = np.arange(self.n_pad, dtype=np.int32)
        ip = np.arange(self.n_pad, dtype=np.int32)
        if self._ord.perm is not None:
            pp[: self.n] = self._ord.perm
            ip[: self.n] = self._ord.inv
        self._op_args = (*dm32.op_args, *dm64.op_args, inv_diag,
                         jnp.asarray(pp), jnp.asarray(ip))
        self._jit_solve = _solve_wrapped

    def _pad_b(self, b):
        b = np.asarray(b, dtype=np.float64)
        if b.shape[0] != self.n:
            raise ValueError(f"b has {b.shape[0]} entries, expected {self.n}")
        bp = jnp.zeros(self.n_pad, jnp.float64).at[: self.n].set(
            jnp.asarray(b))
        return jax.device_put(bp, self.vec_shard)

    def solve(self, b) -> SolveResult:
        x, rnorm, bnorm, iters, passes = self._jit_solve(
            *self._op_args, self._pad_b(b))
        rnorm, bnorm = float(rnorm), float(bnorm)
        relres = rnorm / bnorm if bnorm > 0 else 0.0
        x_host = fetch_global(x, self.n)
        true_rel = self.true_relres(x_host, b)
        return SolveResult(x=x_host, iters=int(iters), relres=relres,
                           converged=true_rel <= self.rtol or bnorm == 0.0,
                           extra={"refine_passes": int(passes),
                                  "strategy": self.strategy,
                                  "local_spmv": self.local_spmv,
                                  "halo": self.plan.halo,
                                  "true_relres": true_rel,
                                  "precision_mode": "fp32_ir_auto"})

    def solve_fn(self):
        op_args = self._op_args
        jit_solve = self._jit_solve
        pad = self._pad_b
        return lambda b: jit_solve(*op_args, pad(b))[0]
