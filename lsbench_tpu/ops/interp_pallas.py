"""Narrow-stencil Pallas SpMV for AMG transfer operators (window-ELL).

The interpolation P (and restriction R) of a classical AMG hierarchy are
extremely sparse (pmax-truncated: ~2-8 nnz/row — hypre.c:135 `interp 6`
with truncation) and, after the coarse renumbering, BANDED: row i's
columns sit near i·(n_coarse/n_fine). Riding them on the 8×128 dense-BSR
layout pads ~260× (496 MB for P₀ at n=262k — RESULTS §4, VERDICT r4
missing 4): 128-wide blocks carry ~5 used columns each.

This layout stores exactly the ELL arrays, TRANSPOSED so fine rows ride
the 128-lane axis:

- `vals`/`lcols`: (k8, n_pad) — slot-major; k8 = nnz/row padded to a
  sublane multiple. HBM cost ≈ 8·nnz/row bytes per row instead of 4 KB
  per 8-row block.
- per 128-row tile, one 128-ALIGNED source window of J·128 entries
  covers every column (bandedness); `w0` holds the tile's window start
  in 128-blocks (scalar prefetch).

The kernel gathers inside VMEM with one-hot MXU matmuls — no per-lane
gather exists on the VPU, but a (128,128) compare + (1,128)@(128,128)
dot per (slot, window-block) pair turns the gather into systolic work:

    sel[w, r] = (lcols[s, r] == w + 128 j)        # VPU compare
    y[r]     += vals[s, r] · Σ_w x_window[w]·sel[w, r]   # MXU

Bytes streamed/apply: 2·k8·n·4 B (~17 MB at n=262k vs 496 MB BSR), and
the host→device setup ships the same — the VERDICT r4 "narrow-block
interp kernel" that cuts both the 36.2 s first setup and the 2.3 GB
hierarchy residency. Reference role: the P/R applies inside
BoomerAMGSolve's cycle (hypre.c:97,224-234).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 128      # fine rows per window tile (lane count)
TPS = 8       # tiles per grid step (output block sublane constraint)
KPAD = 8      # slot (sublane) pad multiple


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class WindowEll:
    vals: jax.Array     # (k8, n_pad) f32, slot-major
    lcols: jax.Array    # (k8, n_pad) int32 — col − 128·w0[tile] ∈ [0, J·128)
    w0: jax.Array       # (T,) int32 window start per tile, in 128-blocks
    nrows: int
    ncols: int
    nnz: int
    j_blocks: int       # J: window width in 128-blocks (static)
    k_real: int = 0     # true max nnz/row (≤ k8): the kernel's slot loop
    #                     runs only this far — the sublane pad rows are
    #                     structurally zero (halves the one-hot compare
    #                     cost for pmax=4 interpolation)

    def tree_flatten(self):
        return ((self.vals, self.lcols, self.w0),
                (self.nrows, self.ncols, self.nnz, self.j_blocks,
                 self.k_real))

    @classmethod
    def tree_unflatten(cls, aux, children):
        vals, lcols, w0 = children
        return cls(vals, lcols, w0, *aux)

    @property
    def k8(self) -> int:
        return self.vals.shape[0]

    @property
    def n_pad(self) -> int:
        return self.vals.shape[1]

    @property
    def bytes_streamed(self) -> int:
        return self.vals.size * 4 + self.lcols.size * 4

    @staticmethod
    def from_csr(M, dtype=jnp.float32, max_k: int = 16, max_j: int = 8,
                 max_table_blocks: int = 4096) -> "WindowEll | None":
        """Build the layout, or None when it can't win: too many
        nnz/row (max_k), window exceeds max_j·128 (not banded — e.g.
        before the coarse alignment), or the source table would overflow
        its VMEM residency budget."""
        if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
            return None
        n, nc = M.nrows, M.ncols
        lens = np.diff(M.offs)
        k = max(1, int(lens.max(initial=1)))
        k8 = _round_up(k, KPAD)
        if k8 > max_k:
            return None
        n_pad = _round_up(n, TR * TPS)
        T = n_pad // TR
        rows = M.row_indices()
        tile = rows // TR

        # Per-tile window: [min_col_aligned, max_col) must fit J blocks.
        mn = np.full(T, np.iinfo(np.int64).max)
        mx = np.zeros(T, dtype=np.int64)
        np.minimum.at(mn, tile, M.cols)
        np.maximum.at(mx, tile, M.cols + 1)
        empty = mn > mx
        mn[empty], mx[empty] = 0, 1
        w0 = mn // TR
        span = mx - w0 * TR
        J = int(_round_up(int(span.max()), TR) // TR)
        if J > max_j:
            return None
        ctab = _round_up(nc, TR) // TR + J  # table blocks incl. read slack
        if ctab > max_table_blocks:
            return None

        vals = np.zeros((n_pad, k8), dtype=np.float32)
        lcols = np.zeros((n_pad, k8), dtype=np.int32)
        slot = np.arange(M.nnz) - M.offs[rows]
        vals[rows, slot] = M.vals
        lcols[rows, slot] = M.cols - w0[tile] * TR
        return WindowEll(
            vals=jnp.asarray(vals.T.copy()),
            lcols=jnp.asarray(lcols.T.copy()),
            w0=jnp.asarray(w0.astype(np.int32)),
            nrows=n, ncols=nc, nnz=M.nnz, j_blocks=J, k_real=k)


def _well_kernel(w0_ref, x_ref, vals_ref, lcols_ref, o_ref, *, k_loop: int,
                 j_blocks: int):
    """TPS window tiles per grid step (the output block must span ≥8
    sublanes on TPU); each tile gathers from its own 128-aligned
    window of the source table."""
    step = pl.program_id(0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TR, TR), 0)  # (w, row)
    for gl in range(TPS):
        cb = w0_ref[step * TPS + gl]
        y = jnp.zeros((TR,), dtype=jnp.float32)
        for j in range(j_blocks):
            xj = x_ref[cb + j, :]                                # (128,)
            # Fold the slot values into ONE weighted selector per
            # window block: W[w,r] = Σ_s vals[s,r]·[lcols[s,r]==w+128j],
            # then a single (1,128)@(128,128) MXU dot gathers+scales.
            W = jnp.zeros((TR, TR), dtype=jnp.float32)
            for s in range(k_loop):
                lc = lcols_ref[s, gl * TR:(gl + 1) * TR]
                sel = (lc[None, :] == iota_w + j * TR).astype(jnp.float32)
                W = W + vals_ref[s, gl * TR:(gl + 1) * TR][None, :] * sel
            g = jax.lax.dot_general(
                xj[None, :], W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)             # (1,128)
            y = y + g[0]
        o_ref[gl] = y


@functools.partial(jax.jit, static_argnames=("k8", "k_loop", "j_blocks",
                                              "interpret"))
def _spmv_well_call(w0, x_table, vals, lcols, k8, k_loop, j_blocks,
                    interpret=False):
    T = vals.shape[1] // TR
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // TPS,),
        in_specs=[
            pl.BlockSpec((x_table.shape[0], TR), lambda t, w0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, TPS * TR), lambda t, w0: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k8, TPS * TR), lambda t, w0: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPS, TR), lambda t, w0: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_well_kernel, k_loop=k_loop,
                              j_blocks=j_blocks),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, TR), jnp.float32),
            interpret=interpret,
        )(w0, x_table, vals, lcols)


def spmv_well(op: WindowEll, v, interpret: bool | None = None):
    """y = M v through the window-ELL layout; v (ncols,) f32 → (nrows,)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ctab = _round_up(op.ncols, TR) // TR + op.j_blocks
    v32 = v.astype(jnp.float32)
    xt = jnp.zeros(ctab * TR, jnp.float32).at[: op.ncols].set(
        v32).reshape(ctab, TR)
    y = _spmv_well_call(op.w0, xt, op.vals, op.lcols, op.k8,
                        op.k_real or op.k8, op.j_blocks,
                        interpret=interpret)
    return y.reshape(-1)[: op.nrows]
