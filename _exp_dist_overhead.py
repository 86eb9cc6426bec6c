"""Does the in-jit permutation-gather trigger carry MSA's VMEM promotion
into the DISTRIBUTED (shard_map) program?

Wrap the existing DistributedCgIr jitted solve in an outer jit that does
the b-permutation gather and x-inverse gather in-program (the single-chip
CgIr trigger shape), forced to exact inner iteration counts.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.ordering.rcm import rcm_ordering
from lsbench_tpu.parallel.dist_cg_ir import DistributedCgIr
from lsbench_tpu.parallel.mesh import make_row_mesh
from lsbench_tpu.utils.fence import host_fence

MATRIX = "/root/reference/tests/xn3b_A_10.txt"

A = read_matrix(MATRIX)
n = A.nrows
perm = rcm_ordering(A)
Ap = A.permuted(perm)
b_np = np.arange(n, dtype=np.float64)
mesh = make_row_mesh(1)


def measure(tag, in_jit_perm):
    walls = {}
    for m in (500, 1500):
        # solver built on the PRE-permuted matrix; ordering="none" so the
        # solver itself does no host permutation
        s = DistributedCgIr(Ap, mesh, rtol=1e-30, inner_rtol=0.0,
                            maxiter=m, max_refine=1, ordering="none")
        n_pad = s.n_pad
        pp = np.concatenate([perm, np.arange(n, n_pad)]).astype(np.int32)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        ip = np.concatenate([inv, np.arange(n, n_pad)]).astype(np.int32)
        pp_d, ip_d = jnp.asarray(pp), jnp.asarray(ip)
        jit_inner = s._jit_solve
        op_args = s._op_args

        if in_jit_perm:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from lsbench_tpu.parallel.mesh import ROWS
            shard = NamedSharding(mesh, P(ROWS))

            @jax.jit
            def run(op_args, braw):
                bp = braw.at[pp_d].get(out_sharding=shard)
                x, rn, bn, it, passes = jit_inner(*op_args, bp)
                return x.at[ip_d].get(out_sharding=shard), it
        else:
            @jax.jit
            def run(op_args, braw):
                x, rn, bn, it, passes = jit_inner(*op_args, braw)
                return x, it

        braw = jnp.zeros(n_pad, jnp.float64).at[:n].set(
            jnp.asarray(b_np if in_jit_perm else b_np[perm]))
        braw = jax.device_put(braw, s.vec_shard)
        out = run(op_args, braw)
        host_fence(out)
        assert int(out[1]) == m, (tag, m, int(out[1]))
        t0 = time.perf_counter()
        o = None
        for _ in range(10):
            o = run(op_args, braw)
        host_fence(o)
        walls[m] = (time.perf_counter() - t0) / 10
    print(json.dumps({"tag": tag,
                      "per_iter_us": round((walls[1500] - walls[500])
                                           / 1000 * 1e6, 1),
                      "walls_ms": {k: round(v * 1e3, 2)
                                   for k, v in walls.items()}}), flush=True)


# measure("dist_cg_ir_host_perm", False)  # measured: 64.2 us/iter
measure("dist_cg_ir_in_jit_perm", True)
