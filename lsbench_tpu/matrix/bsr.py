"""Block-sparse row (BSR) device layout — the Pallas SpMV format.

TPU has no usable vector gather across more than one vreg (8 sublanes), so
gather-based CSR/ELL SpMV lowers to a scalar loop (~20ns/nnz — measured
3.3ms for 146k nnz). The TPU-native answer: store the matrix as dense
8×128 blocks at the block positions that contain nonzeros, and make SpMV a
stream of dense (8,128)·(128,) products — contiguous HBM reads, VPU/MXU
compute, no gathers. RCM ordering (ordering/rcm.py) first concentrates the
nonzeros near the diagonal so fewer blocks are touched (measured 2.2×
fewer on xn3b_A_10).

Layout: rows are grouped by BR=8; for each row group the touched 128-wide
column blocks are stored densely, padded to the max per-group count S:

    blocks:     (n_groups, S*8, 128)  — dense block values (0 in padding)
    block_cols: (n_groups, S) int32   — column-block index of each slot
                                         (0 for padding slots, values 0)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix

BR = 8    # rows per block (f32 sublane count)
BC = 128  # cols per block (lane count)
GPS = 16  # row groups per Pallas grid step (output-tile constraint: 16*8 rows)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class BsrMatrix:
    blocks: jax.Array       # (n_groups, S*br, 128)
    block_cols: jax.Array   # (n_groups, S) int32
    nrows: int
    ncols: int
    nnz: int
    br: int = BR            # rows per block (8/16/32: taller blocks trade
    #                         streamed padding for fewer dynamic x loads)
    sel: jax.Array | None = None  # (n_groups*S, n_col_blocks) one-hot f32
    #                               gather selector (the MXU-gather variant)

    def tree_flatten(self):
        return ((self.blocks, self.block_cols, self.sel),
                (self.nrows, self.ncols, self.nnz, self.br))

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocks, block_cols, sel = children
        nrows, ncols, nnz, br = aux
        return cls(blocks, block_cols, nrows, ncols, nnz, br, sel)

    @property
    def n_groups(self) -> int:
        return self.blocks.shape[0]

    @property
    def slots(self) -> int:
        return self.block_cols.shape[1]

    @property
    def n_col_blocks(self) -> int:
        return _round_up(self.ncols, BC) // BC

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def bytes_streamed(self) -> int:
        """HBM bytes read per SpMV (the roofline numerator)."""
        return self.blocks.size * self.blocks.dtype.itemsize

    @staticmethod
    def from_csr(A: CsrMatrix, dtype=jnp.float32,
                 block_rows: int = BR) -> "BsrMatrix":
        # Pad groups to a multiple of GPS so the kernel's (GPS*br)-row
        # output tiles are full; padding groups are all-zero, block_col 0.
        BRl = block_rows
        n_groups = _round_up(_round_up(A.nrows, BRl) // BRl, GPS)
        r, c, v = A.to_coo()
        gr = r // BRl         # row group of each nnz
        cb = c // BC          # column block of each nnz

        # Unique (group, col-block) pairs, slot index within group.
        keys = gr * (1 << 32) + cb
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        uniq_mask = np.empty(keys_s.size, dtype=bool)
        uniq_mask[0] = True
        uniq_mask[1:] = keys_s[1:] != keys_s[:-1]
        pair_id = np.cumsum(uniq_mask) - 1          # per sorted-nnz pair index
        uniq_keys = keys_s[uniq_mask]
        ugr = (uniq_keys >> 32).astype(np.int64)
        ucb = (uniq_keys & 0xFFFFFFFF).astype(np.int64)

        # Slot index of each unique pair within its group.
        counts = np.bincount(ugr, minlength=n_groups)
        S = max(int(counts.max()), 1)
        group_start = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(counts, out=group_start[1:])
        slot_of_pair = np.arange(ugr.size) - group_start[ugr]

        blocks = np.zeros((n_groups, S * BRl, BC), dtype=np.float64)
        block_cols = np.zeros((n_groups, S), dtype=np.int32)
        block_cols[ugr, slot_of_pair] = ucb

        # Scatter nnz into their block slots.
        pr = pair_id                      # aligned with sorted order
        rs, cs, vs = r[order], c[order], v[order]
        blocks[ugr[pr], slot_of_pair[pr] * BRl + (rs % BRl), cs % BC] = vs

        # One-hot gather selector: row t selects x_table[block_cols_flat[t]].
        # 0/1 values, so f32 is exact; DMA cost is S/(BRl·C) of the blocks
        # (~5% at reference scale).
        C = _round_up(A.ncols, BC) // BC
        flat_cols = block_cols.reshape(-1)
        sel = np.zeros((flat_cols.size, max(C, 1)), dtype=np.float32)
        sel[np.arange(flat_cols.size), flat_cols] = 1.0

        return BsrMatrix(
            blocks=jnp.asarray(blocks, dtype=dtype),
            block_cols=jnp.asarray(block_cols),
            nrows=A.nrows, ncols=A.ncols, nnz=A.nnz, br=BRl,
            sel=jnp.asarray(sel))

    def matvec(self, x: jax.Array) -> jax.Array:
        from lsbench_tpu.ops.spmv_pallas import spmv_bsr
        return spmv_bsr(self, x)

    @property
    def mean_slots(self) -> float:
        """Mean occupied slots per group (padding efficiency diagnostic)."""
        return float(jnp.sum(jnp.any(self.blocks.reshape(
            self.n_groups, self.slots, self.br * BC) != 0, axis=-1))) / self.n_groups

    def matvec_reference(self, x: jax.Array) -> jax.Array:
        """jnp reference of the same math (oracle for the Pallas kernel)."""
        x_pad = jnp.zeros(self.n_col_blocks * BC, self.dtype).at[: self.ncols].set(
            x.astype(self.dtype))
        xb = x_pad.reshape(self.n_col_blocks, BC)
        gathered = xb[self.block_cols]                      # (G, S, 128)
        blk = self.blocks.reshape(self.n_groups, self.slots, self.br, BC)
        y = jnp.einsum("gsrc,gsc->gr", blk, gathered)
        return y.reshape(-1)[: self.nrows]

    def matvec_xla(self, x: jax.Array) -> jax.Array:
        """Gather-free XLA SpMV: the x gather is the selector matmul (two
        dense contractions total — both MXU-lowerable at any dtype,
        including emulated f64). This is the fast *FP64* TPU path: element
        gathers cost ~20 ns each on TPU, so the reference-precision
        protocol (lsbench.c:140-141) would otherwise be gather-bound."""
        dt = x.dtype
        x_pad = jnp.zeros(self.n_col_blocks * BC, dt).at[: self.ncols].set(x)
        xb = x_pad.reshape(self.n_col_blocks, BC)
        # HIGHEST precision: TPU matmuls default to bf16 operand rounding.
        hp = jax.lax.Precision.HIGHEST
        g = jnp.matmul(self.sel.astype(dt), xb, precision=hp)  # (G*S, 128)
        blk = self.blocks.astype(dt).reshape(
            self.n_groups, self.slots, self.br, BC)
        y = jnp.einsum("gsrc,gsc->gr", blk,
                       g.reshape(self.n_groups, self.slots, BC),
                       precision=hp)
        return y.reshape(-1)[: self.nrows]


@jax.tree_util.register_pytree_node_class
@dataclass
class BsrCompact:
    """Exact-block BSR: only the occupied (8-row, 128-col) blocks are
    stored, group-major, with per-block (group id, col-block id) metadata.

    Streams Σ_g S_g blocks per SpMV instead of BsrMatrix's G·S_max — the
    padding-free layout (xn3b_A_10: 21.3 MB vs 46.8 MB). The kernel keeps
    the whole output resident in VMEM (G·8 floats) and scatter-accumulates
    per block, so grid steps are free to cut across row groups.
    """

    blocks: jax.Array      # (T_pad, 8, 128)
    gids: jax.Array        # (T_pad,) int32 row-group id (pad → 0, blocks 0)
    bcols: jax.Array       # (T_pad,) int32 column-block id
    nrows: int
    ncols: int
    nnz: int
    n_groups: int          # real row groups (no GPS padding needed)

    def tree_flatten(self):
        return ((self.blocks, self.gids, self.bcols),
                (self.nrows, self.ncols, self.nnz, self.n_groups))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_blocks(self) -> int:
        return self.blocks.shape[0]

    @property
    def n_col_blocks(self) -> int:
        return _round_up(self.ncols, BC) // BC

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def bytes_streamed(self) -> int:
        return self.blocks.size * self.blocks.dtype.itemsize

    @staticmethod
    def from_csr(A: CsrMatrix, dtype=jnp.float32,
                 blocks_per_step: int = 16) -> "BsrCompact":
        r, c, v = A.to_coo()
        gr = (r // BR).astype(np.int64)
        cb = (c // BC).astype(np.int64)
        keys = gr * (1 << 32) + cb
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        uniq_mask = np.empty(keys_s.size, dtype=bool)
        uniq_mask[0] = True
        uniq_mask[1:] = keys_s[1:] != keys_s[:-1]
        pair_id = np.cumsum(uniq_mask) - 1
        uniq_keys = keys_s[uniq_mask]
        ugr = (uniq_keys >> 32).astype(np.int64)
        ucb = (uniq_keys & 0xFFFFFFFF).astype(np.int64)

        T = _round_up(max(ugr.size, 1), blocks_per_step)
        blocks = np.zeros((T, BR, BC), dtype=np.float64)
        rs, cs, vs = r[order], c[order], v[order]
        blocks[pair_id, rs % BR, cs % BC] = vs
        gids = np.zeros(T, dtype=np.int32)
        bcols = np.zeros(T, dtype=np.int32)
        gids[: ugr.size] = ugr
        bcols[: ucb.size] = ucb
        n_groups = _round_up(A.nrows, BR) // BR
        return BsrCompact(
            blocks=jnp.asarray(blocks, dtype=dtype),
            gids=jnp.asarray(gids), bcols=jnp.asarray(bcols),
            nrows=A.nrows, ncols=A.ncols, nnz=A.nnz, n_groups=n_groups)

    def matvec(self, x: jax.Array) -> jax.Array:
        from lsbench_tpu.ops.spmv_pallas import spmv_bsr_compact
        return spmv_bsr_compact(self, x)

    def matvec_reference(self, x: jax.Array) -> jax.Array:
        x_pad = jnp.zeros(self.n_col_blocks * BC, self.dtype).at[: self.ncols].set(
            x.astype(self.dtype))
        xb = x_pad.reshape(self.n_col_blocks, BC)
        part = jnp.einsum("trc,tc->tr", self.blocks, xb[self.bcols])
        y = jnp.zeros((self.n_groups, BR), self.dtype).at[self.gids].add(part)
        return y.reshape(-1)[: self.nrows]
