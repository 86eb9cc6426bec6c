"""Distributed (block-row partitioned) preconditioned CG via shard_map.

The TPU-native replacement for the reference's non-existent multi-device
path (SURVEY.md §2.2): the ELL matrix is partitioned by contiguous row
blocks over a 1-D mesh; vectors are row-sharded. Per iteration:

- `all_gather` of the search direction p over ICI (v1 halo strategy —
  the halo-compressed `ppermute` ring lives in dist_spmv.py, later),
- local ELL SpMV on the owned row block (no cross-device gather),
- ONE fused `psum` for all scalar reductions (α and stopping norms
  together; β's reduction rides the same psum of the next iteration).

The matrix rows are padded so every device owns an equal block; padded rows
are zero so they contribute nothing to dots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.ell import EllMatrix
from lsbench_tpu.parallel.mesh import ROWS
from lsbench_tpu.solvers.base import SolveResult, Solver


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class DistributedCg(Solver):
    """CG over a row mesh. Usable single-host (many chips) or CPU-simulated."""

    name = "dist_cg"

    def __init__(self, A: CsrMatrix, mesh: Mesh, dtype=jnp.float64,
                 rtol=1e-8, maxiter=None, row_align: int = 8, **params):
        super().__init__(A, **params)
        self.mesh = mesh
        self.dtype = jnp.dtype(dtype)
        self.rtol = float(rtol)
        self.maxiter = int(maxiter) if maxiter is not None else max(10 * A.nrows, 1000)
        n_dev = mesh.devices.size

        # Equal row blocks: pad rows to n_dev * row_align multiple.
        ell = EllMatrix.from_csr(A, dtype=self.dtype,
                                 row_align=n_dev * row_align)
        self.n = A.nrows
        self.n_pad = ell.n_pad

        row_shard = NamedSharding(mesh, P(ROWS, None))
        vec_shard = NamedSharding(mesh, P(ROWS))
        self.vec_shard = vec_shard
        vals = jax.device_put(ell.vals, row_shard)
        cols = jax.device_put(ell.cols, row_shard)

        # Jacobi preconditioner, padded+sharded (pad slots get inv_diag=1,
        # harmless since r is 0 there).
        d = np.ones(self.n_pad)
        diag = A.diagonal()
        d[: self.n] = np.where(diag != 0.0, diag, 1.0)
        inv_diag = jax.device_put(jnp.asarray(1.0 / d, dtype=self.dtype), vec_shard)

        rtol_c, maxiter_c = self.rtol, self.maxiter

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(ROWS, None), P(ROWS, None), P(ROWS), P(ROWS)),
                 out_specs=(P(ROWS), P(), P()))
        def _cg(vals_l, cols_l, inv_diag_l, b_l):
            def fused_psum(*scalars):
                s = jax.lax.psum(jnp.stack(scalars), ROWS)
                return tuple(s[i] for i in range(len(scalars)))

            def matvec(p_full, owned):
                # Local rows × full vector; cols index the global vector.
                del owned
                return jnp.sum(vals_l * p_full[cols_l], axis=1)

            (bb,) = fused_psum(jnp.vdot(b_l, b_l))
            tol2 = (rtol_c ** 2) * bb

            x0 = jnp.zeros_like(b_l)
            r0 = b_l
            z0 = inv_diag_l * r0
            p0 = z0
            rz0, rr0 = fused_psum(jnp.vdot(r0, z0), jnp.vdot(r0, r0))

            def cond(s):
                *_, rr, it = s
                return jnp.logical_and(it < maxiter_c, rr > tol2)

            def body(s):
                x, r, p, rz, rr, it = s
                p_full = jax.lax.all_gather(p, ROWS, tiled=True)
                Ap = matvec(p_full, p)
                (pAp,) = fused_psum(jnp.vdot(p, Ap))
                alpha = rz / pAp
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_diag_l * r
                rz_new, rr_new = fused_psum(jnp.vdot(r, z), jnp.vdot(r, r))
                beta = rz_new / rz
                p = z + beta * p
                return (x, r, p, rz_new, rr_new, it + 1)

            x, r, p, rz, rr, it = jax.lax.while_loop(
                cond, body, (x0, r0, p0, rz0, rr0, jnp.int32(0)))
            return x, jnp.sqrt(rr / jnp.where(bb > 0, bb, 1.0)), it

        self._vals, self._cols, self._inv_diag = vals, cols, inv_diag
        self._jit_cg = jax.jit(_cg)

    def _pad_b(self, b):
        b = jnp.asarray(b, dtype=self.dtype)
        if b.shape[0] != self.n:
            raise ValueError(f"b has {b.shape[0]} entries, expected {self.n}")
        bp = jnp.zeros(self.n_pad, dtype=self.dtype).at[: self.n].set(b)
        return jax.device_put(bp, self.vec_shard)

    def solve(self, b) -> SolveResult:
        x, relres, iters = self._jit_cg(self._vals, self._cols,
                                        self._inv_diag, self._pad_b(b))
        relres = float(relres)
        # Slice padding off on host (x is row-sharded; device slicing across
        # shard boundaries would need a resharding collective).
        x_host = np.asarray(x)[: self.n]
        return SolveResult(x=x_host, iters=int(iters), relres=relres,
                           converged=relres <= self.rtol)

    def solve_fn(self):
        vals, cols, inv_diag = self._vals, self._cols, self._inv_diag
        jit_cg = self._jit_cg
        pad = self._pad_b
        return lambda b: jit_cg(vals, cols, inv_diag, pad(b))
