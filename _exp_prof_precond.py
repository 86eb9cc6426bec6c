"""Attribute the n=262k AMG-CG-IR first-setup time (VERDICT r3 next 5 /
r4 missing 4): host hierarchy vs per-level operator layout build+upload.
Round 5: P/R ride the window-ELL layout (ops/interp_pallas.py) when it
wins — this prints which layout each operator resolved to and its
device bytes. Run on the TPU rig; ~5 min."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.ops.interp_pallas import WindowEll
from lsbench_tpu.solvers.amg import (AmgOptions, _bsr_bytes,
                                     build_matrix_hierarchy)
from lsbench_tpu.solvers.cg import build_matvec, resolve_layout

A = poisson_2d(512)
opts = AmgOptions(coarsening="classical", theta=0.25)
t0 = time.perf_counter()
mats, Al = build_matrix_hierarchy(A, opts)
t_h = time.perf_counter() - t0
print(f"host hierarchy {t_h:.1f}s levels={len(mats)}", flush=True)
layout = resolve_layout("auto", jnp.float32)
tot_bytes = 0
for l, m in enumerate(mats):
    for key in ("A", "P", "R"):
        M = m[key]
        t0 = time.perf_counter()
        if key in ("P", "R"):
            op = WindowEll.from_csr(M, max_j=16 if M.nrows < 50_000 else 8)
            if op is not None and op.bytes_streamed * 4 < _bsr_bytes(M):
                kind = f"well(k={op.k_real},J={op.j_blocks})"
            else:
                op = None
        else:
            op = None
        if op is None:
            ap, op, stream = build_matvec(M, jnp.float32, layout)
            kind = layout
        jax.block_until_ready(jax.tree_util.tree_leaves(op)[0])
        dt = time.perf_counter() - t0
        sz = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(op) if hasattr(x, "size"))
        tot_bytes += sz
        print(f"lvl{l} {key}: {kind} n={M.nrows}x{M.ncols} nnz={M.nnz} "
              f"bytes={sz/1e6:.0f}MB t={dt:.1f}s", flush=True)
print(f"total layout bytes {tot_bytes/1e6:.0f}MB", flush=True)
