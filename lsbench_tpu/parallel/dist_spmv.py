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


@dataclass
class HaloBsrPlan:
    """Host-built plan for the Pallas BSR local SpMV inside shard_map.

    Per-device BSR layouts (matrix/bsr.py) over the halo-extended local
    coordinate system, padded to a common (G, S) shape across devices and
    stacked on a leading device axis so they ride into shard_map as
    row-sharded arrays. f32: `blocks_hi` only; f64 (double-float):
    hi + lo == f64(A) to ~2⁻⁴⁸ (matrix/bsr.py::BsrDf64 role).
    """
    bcols: jax.Array              # (D, G*S) int32, flat block-column ids
    blocks_hi: jax.Array          # (D, G, S*8, 128) f32
    blocks_lo: jax.Array | None   # (D, G, S*8, 128) f32 (df64 path) or None
    n: int
    n_pad: int
    nloc: int
    halo: int
    n_devices: int
    n_ext: int                    # nloc + 2*halo (extended local width)
    needs_all_gather: bool

    @property
    def bytes_streamed(self) -> int:
        """HBM bytes read per full SpMV across all devices."""
        sz = self.blocks_hi.size * 4
        if self.blocks_lo is not None:
            sz *= 2
        return sz


def build_halo_bsr_plan(A: CsrMatrix, n_devices: int, dtype=jnp.float32,
                        row_align: int = 8) -> HaloBsrPlan:
    """Build the stacked per-device BSR layout with halo-local columns.

    Columns are renumbered to extended-local ids (global col − block start
    + H) so each device's Pallas kernel reads only its (nloc + 2H)-wide
    x table — the halo-local renumbering SURVEY.md §7.6 calls for.
    """
    from lsbench_tpu.matrix.bsr import BC, BsrMatrix

    n = A.nrows
    nloc = _round_up(-(-n // n_devices), max(row_align, 8))
    n_pad = nloc * n_devices

    r, c, v = A.to_coo()
    dev = r // nloc
    off = c - dev * nloc
    reach_left = int(np.maximum(0, -off).max(initial=0))
    reach_right = int(np.maximum(0, off - (nloc - 1)).max(initial=0))
    H = _round_up(max(max(reach_left, reach_right), 1), 8)
    if H > nloc:
        return HaloBsrPlan(
            bcols=jnp.zeros((n_devices, 1), jnp.int32),
            blocks_hi=jnp.zeros((n_devices, 1, 8, BC), jnp.float32),
            blocks_lo=None, n=n, n_pad=n_pad, nloc=nloc, halo=H,
            n_devices=n_devices, n_ext=nloc + 2 * H, needs_all_gather=True)
    n_ext = nloc + 2 * H

    want_df64 = jnp.dtype(dtype) == jnp.dtype(jnp.float64)
    locals_ = []
    for d in range(n_devices):
        m = dev == d
        # f64 blocks; split into hi/lo after padding if df64 requested.
        locals_.append(BsrMatrix.from_csr(
            CsrMatrix.from_coo(r[m] - d * nloc, off[m] + H, v[m],
                               nrows=nloc, ncols=n_ext),
            dtype=jnp.float64))

    G = max(bl.n_groups for bl in locals_)
    S = max(bl.slots for bl in locals_)
    D = n_devices
    blocks64 = np.zeros((D, G, S * 8, BC), dtype=np.float64)
    bcols = np.zeros((D, G, S), dtype=np.int32)
    for d, bl in enumerate(locals_):
        g, s = bl.n_groups, bl.slots
        blk = np.asarray(bl.blocks).reshape(g, s, 8, BC)
        blocks64[d, :g, : s * 8, :] = blk.reshape(g, s * 8, BC)
        bcols[d, :g, :s] = np.asarray(bl.block_cols)

    hi = blocks64.astype(np.float32)
    lo = ((blocks64 - hi.astype(np.float64)).astype(np.float32)
          if want_df64 else None)
    return HaloBsrPlan(
        bcols=jnp.asarray(bcols.reshape(D, G * S)),
        blocks_hi=jnp.asarray(hi),
        blocks_lo=None if lo is None else jnp.asarray(lo),
        n=n, n_pad=n_pad, nloc=nloc, halo=H, n_devices=n_devices,
        n_ext=n_ext, needs_all_gather=False)


def _halo_exchange(x_l, H: int):
    """Ring-exchange the H boundary entries of the local x (ppermute)."""
    ndev = jax.lax.axis_size(ROWS)
    right_halo = jax.lax.ppermute(
        x_l[:H], ROWS, [(d, d - 1) for d in range(1, ndev)])
    left_halo = jax.lax.ppermute(
        x_l[-H:], ROWS, [(d, d + 1) for d in range(ndev - 1)])
    return jnp.concatenate([left_halo, x_l, right_halo])


def halo_spmv_bsr_local(halo: int, nloc: int, n_ext: int,
                        bcols_l, blocks_l, x_l,
                        interpret: bool | None = None):
    """Inside shard_map: ppermute halo exchange + Pallas f32 BSR SpMV.

    bcols_l: (1, G*S); blocks_l: (1, G, S*8, 128) — this device's shard of
    the stacked plan arrays. x_l: (nloc,). Returns (nloc,) f32.
    """
    from lsbench_tpu.matrix.bsr import BC, BR
    from lsbench_tpu.ops.spmv_pallas import _spmv_bsr_call

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x_ext = _halo_exchange(x_l.astype(jnp.float32), halo)
    n_cb = -(-n_ext // BC)
    x_pad = jnp.zeros(n_cb * BC, jnp.float32).at[:n_ext].set(x_ext)
    y = _spmv_bsr_call(bcols_l.reshape(-1), x_pad.reshape(n_cb, BC),
                       blocks_l[0], br=BR, interpret=interpret)
    return y.reshape(-1)[:nloc]


def halo_spmv_bsr_df64_local(halo: int, nloc: int, n_ext: int,
                             bcols_l, blocks_hi_l, blocks_lo_l, x_l,
                             interpret: bool | None = None):
    """Inside shard_map: halo exchange + double-float Pallas SpMV (f64 in,
    f64 out to ~2⁻⁴⁹ — the reference-precision distributed hot loop)."""
    from lsbench_tpu.matrix.bsr import BC, BR
    from lsbench_tpu.ops.spmv_pallas import _spmv_bsr_df64_call

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x_ext = _halo_exchange(x_l.astype(jnp.float64), halo)
    n_cb = -(-n_ext // BC)
    x_pad = jnp.zeros(n_cb * BC, jnp.float64).at[:n_ext].set(x_ext)
    xh = x_pad.astype(jnp.float32)
    xl = (x_pad - xh.astype(jnp.float64)).astype(jnp.float32)
    yh, yl = _spmv_bsr_df64_call(
        bcols_l.reshape(-1), xh.reshape(n_cb, BC), xl.reshape(n_cb, BC),
        blocks_hi_l[0], blocks_lo_l[0], br=BR, interpret=interpret)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(-1)[:nloc]


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
