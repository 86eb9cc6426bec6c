"""Halo-exchange distributed SpMV over a block-row partition.

The reference has no working distributed path (SURVEY.md §2.2); this is the
TPU-native design: each device owns a contiguous block of rows, and for a
banded matrix (e.g. after RCM, ordering/rcm.py) the off-block columns its
rows touch lie within a halo of width H of its block boundaries. Per SpMV:

- two `ppermute`s move the H boundary entries of x to the left/right ring
  neighbors over ICI (the neighbor-exchange pattern of ring attention),
- the local (nloc + 2H)-wide extended vector feeds a purely local padded-row
  SpMV whose column ids were remapped to extended coordinates at setup.

This moves O(H) per device instead of all_gather's O(n), and the exchange
overlaps with the local gather under XLA's scheduler. Matrices whose
couplings exceed one neighbor block (H > nloc) report `needs_all_gather`,
and callers fall back to the all_gather strategy.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.parallel.mesh import ROWS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class HaloSpmvPlan:
    """Host-built plan: sharded ELL arrays with halo-local column ids."""
    vals: jax.Array        # (n_pad, k) row-sharded
    cols: jax.Array        # (n_pad, k) int32, ids into the extended vector
    n: int                 # true rows
    n_pad: int             # D * nloc
    nloc: int
    halo: int              # H
    n_devices: int
    needs_all_gather: bool

    def tree_flatten(self):  # not a pytree; plan holds static metadata
        raise NotImplementedError


def build_halo_plan(A: CsrMatrix, n_devices: int, dtype,
                    row_align: int = 8) -> HaloSpmvPlan:
    n = A.nrows
    nloc = _round_up(-(-n // n_devices), row_align)
    n_pad = nloc * n_devices

    r, c, v = A.to_coo()
    dev = r // nloc
    # Column offset of each nnz relative to its device's block start.
    off = c - dev * nloc
    # Halo width: how far columns reach outside [0, nloc).
    reach_left = int(np.maximum(0, -off).max(initial=0))
    reach_right = int(np.maximum(0, off - (nloc - 1)).max(initial=0))
    H = max(reach_left, reach_right)
    H = _round_up(max(H, 1), 8)
    needs_all_gather = H > nloc

    # ELL with extended-coordinate columns: ext index = off + H ∈ [0, nloc+2H).
    counts = np.diff(A.offs)
    k = max(int(counts.max()), 1)
    vals = np.zeros((n_pad, k), dtype=np.float64)
    cols = np.full((n_pad, k), H, dtype=np.int32)  # padding → safe in-range id
    rows_idx = A.row_indices()
    slot = np.arange(A.nnz) - A.offs[rows_idx]
    vals[rows_idx, slot] = v
    if not needs_all_gather:
        cols[rows_idx, slot] = (off + H).astype(np.int32)
    else:
        cols[rows_idx, slot] = c.astype(np.int32)

    return HaloSpmvPlan(
        vals=jnp.asarray(vals, dtype=dtype), cols=jnp.asarray(cols),
        n=n, n_pad=n_pad, nloc=nloc, halo=H, n_devices=n_devices,
        needs_all_gather=needs_all_gather)


def halo_spmv_local(plan_halo: int, vals_l, cols_l, x_l):
    """Inside shard_map: exchange halos with ring neighbors, then local SpMV.

    vals_l/cols_l: this device's (nloc, k) block; x_l: (nloc,) local x.
    Returns (nloc,) local y.
    """
    H = plan_halo
    axis = ROWS
    ndev = jax.lax.axis_size(axis)
    # Send my left edge to my left neighbor (they see it as their right
    # halo), and my right edge to my right neighbor (their left halo).
    right_halo = jax.lax.ppermute(
        x_l[:H], axis, [(d, d - 1) for d in range(1, ndev)])
    left_halo = jax.lax.ppermute(
        x_l[-H:], axis, [(d, d + 1) for d in range(ndev - 1)])
    x_ext = jnp.concatenate([left_halo, x_l, right_halo])
    prod = vals_l * x_ext[cols_l]
    return jnp.sum(prod, axis=1)
