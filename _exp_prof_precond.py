import time
import numpy as np
import jax, jax.numpy as jnp
from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.solvers.amg import AmgOptions, build_matrix_hierarchy, build_hierarchy
from lsbench_tpu.solvers.cg import build_matvec, resolve_layout

A = poisson_2d(512)
opts = AmgOptions(coarsening="classical", theta=0.25)
t0=time.perf_counter()
mats, Al = build_matrix_hierarchy(A, opts)
t_h = time.perf_counter()-t0
print(f"host hierarchy {t_h:.1f}s levels={len(mats)}", flush=True)
layout = resolve_layout("auto", jnp.float32)
tot_bytes = 0
for l, m in enumerate(mats):
    for key in ("A","P","R"):
        t0=time.perf_counter()
        ap, op, stream = build_matvec(m[key], jnp.float32, layout if key=="A" else layout)
        jax.block_until_ready(jax.tree_util.tree_leaves(op)[0])
        dt = time.perf_counter()-t0
        sz = sum(x.size*x.dtype.itemsize for x in jax.tree_util.tree_leaves(op) if hasattr(x,'size'))
        tot_bytes += sz
        print(f"lvl{l} {key}: n={m[key].nrows}x{m[key].ncols} nnz={m[key].nnz} layout_bytes={sz/1e6:.0f}MB t={dt:.1f}s", flush=True)
print(f"total layout bytes {tot_bytes/1e6:.0f}MB", flush=True)
