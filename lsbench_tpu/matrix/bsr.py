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
                 block_rows: int = BR, with_sel: bool = False) -> "BsrMatrix":
        n_groups, S, block_cols, dest, vs = _bsr_layout_plan(A, block_rows)
        flat = n_groups * S * block_rows * BC
        if _device_build_wins(flat * jnp.dtype(dtype).itemsize, flat):
            blocks = _materialize_blocks(
                (n_groups, S * block_rows, BC), dest, vs, dtype)
        else:
            b = np.zeros(flat)
            b[dest] = vs
            blocks = jnp.asarray(
                b.reshape(n_groups, S * block_rows, BC), dtype=dtype)
        sel = None
        if with_sel:
            sel = jnp.asarray(_bsr_selector(block_cols, A.ncols))
        return BsrMatrix(
            blocks=blocks,
            block_cols=jnp.asarray(block_cols),
            nrows=A.nrows, ncols=A.ncols, nnz=A.nnz, br=block_rows,
            sel=sel)

    def ensure_sel(self) -> "BsrMatrix":
        """Build the one-hot gather selector on demand. It is (G*S, C)
        f32 — 1.6 GB at n=262k — and only the non-default "selector"
        SpMV variant and matvec_xla need it, so from_csr skips it by
        default (it used to dominate layout setup at scale: tens of
        seconds of host build + device transfer through the tunnel)."""
        if self.sel is None:
            import jax.core as _core
            if isinstance(self.block_cols, jax.Array) and not isinstance(
                    self.block_cols, _core.Tracer):
                pass  # concrete device array: safe to pull to host
            elif not isinstance(self.block_cols, np.ndarray):
                # Inside jit the matrix is a pytree of tracers: np.asarray
                # would raise ConcretizationTypeError, and mutating `sel`
                # would change the registered treedef mid-trace. Demand
                # eager construction instead.
                raise ValueError(
                    "BsrMatrix.sel is needed inside a traced computation "
                    "but was never built. Construct the matrix with "
                    "BsrMatrix.from_csr(..., with_sel=True) (or call "
                    "ensure_sel() before jit) to use the selector variant.")
            self.sel = jnp.asarray(_bsr_selector(
                np.asarray(self.block_cols), self.ncols))
        return self


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
        self.ensure_sel()
        g = jnp.matmul(self.sel.astype(dt), xb, precision=hp)  # (G*S, 128)
        blk = self.blocks.astype(dt).reshape(
            self.n_groups, self.slots, self.br, BC)
        y = jnp.einsum("gsrc,gsc->gr", blk,
                       g.reshape(self.n_groups, self.slots, BC),
                       precision=hp)
        return y.reshape(-1)[: self.nrows]


def _bsr_layout_plan(A: CsrMatrix, block_rows: int = BR):
    """Scatter plan of the padded BSR layout WITHOUT materializing it:
    (n_groups, S, block_cols i32, dest int64 flat indices, vals f64).
    `dest` addresses the flattened (n_groups, S*br, BC) block array —
    unique per nnz (CSR has unique (r, c))."""
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

    block_cols = np.zeros((n_groups, S), dtype=np.int32)
    block_cols[ugr, slot_of_pair] = ucb

    pr = pair_id                      # aligned with sorted order
    rs, cs, vs = r[order], c[order], v[order]
    dest = (((ugr[pr] * S + slot_of_pair[pr]) * BRl + rs % BRl) * BC
            + cs % BC)
    return n_groups, S, block_cols, dest, vs


def _device_build_wins(padded_bytes: int, flat_size: int) -> bool:
    """Materialize the padded blocks ON DEVICE (compact ~nnz·8 B scatter
    upload + one XLA unique-indices scatter) instead of shipping the
    padded host array: through the remote-TPU tunnel the padded transfer
    dominates first-time setup at scale (n=262k AMG: hundreds of MB of
    layouts → tens of seconds — the VERDICT r3 'first setup 70 s' gap).
    Gated on TPU + a size worth the scatter (the compact path costs one
    scatter compile + 2 uploads, the padded path one bandwidth-bound
    upload — measured crossover on the tunnel ~tens of MB); int32
    scatter addressing caps the flat size."""
    return (jax.default_backend() == "tpu" and padded_bytes > (64 << 20)
            and flat_size < (1 << 31))


def _materialize_blocks(shape, dest, vals, dtype) -> jax.Array:
    flat = int(np.prod(shape))
    return (jnp.zeros(flat, dtype=dtype)
            .at[jnp.asarray(dest, dtype=jnp.int32)]
            .set(jnp.asarray(np.asarray(vals, dtype=jnp.dtype(dtype))),
                 unique_indices=True)
            .reshape(shape))


def _bsr_host_layout(A: CsrMatrix, block_rows: int = BR):
    """Host-side (numpy) BSR assembly: (blocks f64, block_cols i32).

    Kept device-free so callers needing a transformed upload (e.g. the
    double-float hi/lo split) never round-trip a 10s-of-MB emulated-f64
    array through the remote-TPU tunnel — measured MINUTES per direction
    at reference scale."""
    n_groups, S, block_cols, dest, vs = _bsr_layout_plan(A, block_rows)
    blocks = np.zeros(n_groups * S * block_rows * BC, dtype=np.float64)
    blocks[dest] = vs
    return blocks.reshape(n_groups, S * block_rows, BC), block_cols


def classed_layout_wins(A: CsrMatrix, block_rows: int = BR,
                        min_supergroups: int = 1024,
                        min_ratio: float = 1.25) -> bool:
    """Cheap pre-layout decision: should the f32 SpMV use the class-padded
    layout (BsrClassed) instead of uniform padding (BsrMatrix)?

    Uniform pads every supergroup to the global max slot count; one wide
    row region taxes the whole stream. Classing costs ~10 us of pipeline
    fill per extra pallas_call, so it only pays when the matrix is large
    (SpMV time >> call overhead) AND the padding ratio is material.
    Measured: xn3b_A_10 (816 groups) uniform 65 us vs classed 80 us —
    uniform wins; n=262k Poisson uniform 671 MB vs classed 530 MB streamed
    — classed wins. The stat pass is a numpy groupby, O(nnz)."""
    BRl = block_rows
    n_groups = _round_up(_round_up(A.nrows, BRl) // BRl, GPS)
    n_sg = n_groups // GPS
    if n_sg < min_supergroups:
        return False
    r, c, _ = A.to_coo()
    keys = (r // BRl) * (1 << 32) + c // BC
    uniq = np.unique(keys)
    counts = np.bincount((uniq >> 32).astype(np.int64), minlength=n_groups)
    sg_S = counts.reshape(n_sg, GPS).max(axis=1)
    smax = max(int(sg_S.max()), 1)
    exact = float(np.maximum(sg_S, 1).sum())
    return (n_sg * smax) / exact >= min_ratio


def _bsr_selector(block_cols: np.ndarray, ncols: int) -> np.ndarray:
    """One-hot gather selector: row t selects x_table[block_cols_flat[t]].
    0/1 values, so f32 is exact; DMA cost is S/(BRl*C) of the blocks
    (~5% at reference scale) but the HOST array is (G*S, C) — quadratic-ish
    in n — so it is built lazily (BsrMatrix.ensure_sel), never eagerly."""
    C = max(_round_up(ncols, BC) // BC, 1)
    flat_cols = block_cols.reshape(-1)
    sel = np.zeros((flat_cols.size, C), dtype=np.float32)
    sel[np.arange(flat_cols.size), flat_cols] = 1.0
    return sel


@jax.tree_util.register_pytree_node_class
@dataclass
class BsrDf64:
    """Double-float BSR: the operator held as (hi, lo) f32 block pairs with
    hi + lo == f64(A) to ~2⁻⁴⁸. Feeds the compensated Pallas SpMV
    (ops/spmv_pallas.py::spmv_bsr_df64) — the fast TPU f64 path; plain
    emulated-f64 SpMVs (gather ELL / selector matmul) cost ~100x more."""

    blocks_hi: jax.Array    # (n_groups, S*br, 128) f32
    blocks_lo: jax.Array    # (n_groups, S*br, 128) f32
    block_cols: jax.Array   # (n_groups, S) int32
    nrows: int
    ncols: int
    nnz: int
    br: int = BR

    def tree_flatten(self):
        return ((self.blocks_hi, self.blocks_lo, self.block_cols),
                (self.nrows, self.ncols, self.nnz, self.br))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_groups(self) -> int:
        return self.blocks_hi.shape[0]

    @property
    def n_col_blocks(self) -> int:
        return _round_up(self.ncols, BC) // BC

    @property
    def bytes_streamed(self) -> int:
        return (self.blocks_hi.size + self.blocks_lo.size) * 4

    @staticmethod
    def from_csr(A: CsrMatrix, block_rows: int = BR) -> "BsrDf64":
        # hi/lo split entirely on HOST (numpy f64, per-nnz), then two f32
        # uploads. Routing through a device f64 BsrMatrix round-trips the
        # blocks as emulated f64 over the remote-TPU tunnel — measured
        # minutes at reference scale vs <1 s this way. At scale the
        # padded arrays themselves materialize ON DEVICE from the compact
        # nnz scatter (shared dest for hi and lo).
        n_groups, S, block_cols, dest, vs = _bsr_layout_plan(A, block_rows)
        hi_nnz = vs.astype(np.float32)
        lo_nnz = (vs - hi_nnz.astype(np.float64)).astype(np.float32)
        flat = n_groups * S * block_rows * BC
        shape = (n_groups, S * block_rows, BC)
        if _device_build_wins(flat * 8, flat):
            hi = _materialize_blocks(shape, dest, hi_nnz, jnp.float32)
            lo = _materialize_blocks(shape, dest, lo_nnz, jnp.float32)
        else:
            hb = np.zeros(flat, dtype=np.float32)
            hb[dest] = hi_nnz
            lb = np.zeros(flat, dtype=np.float32)
            lb[dest] = lo_nnz
            hi, lo = jnp.asarray(hb.reshape(shape)), jnp.asarray(
                lb.reshape(shape))
        return BsrDf64(blocks_hi=hi, blocks_lo=lo,
                       block_cols=jnp.asarray(block_cols), nrows=A.nrows,
                       ncols=A.ncols, nnz=A.nnz, br=block_rows)

    def matvec(self, x: jax.Array) -> jax.Array:
        from lsbench_tpu.ops.spmv_pallas import spmv_bsr_df64
        return spmv_bsr_df64(self, x)


@jax.tree_util.register_pytree_node_class
@dataclass
class BsrClassed:
    """Class-padded BSR: supergroups (GPS row groups) are bucketed into a
    few slot-width classes instead of all padding to the global max S.

    BsrMatrix pads every group to max_g S_g — one dense row region pads the
    whole matrix (xn3b_A_10: 46.8 MB streamed vs 21.3 MB of occupied
    blocks). Classing keeps the padded kernel's strengths (slot
    accumulation, ONE cross-lane reduction per group) while cutting the
    stream to Σ_sg S_class(sg): one pallas_call per class, each writing its
    output tiles at scalar-prefetched dynamic positions, chained through
    `input_output_aliases` so untouched tiles pass through.

    Class thresholds are chosen by exact minimization of padded bytes over
    the per-supergroup slot counts.

    Measured tradeoff (v5e, xn3b_A_10): 34.9 MB streamed vs BsrMatrix's
    46.8 MB, but each extra pallas_call costs ~10 µs of pipeline
    fill/drain, so at reference scale (n ≈ 6k) the uniform layout is
    faster (65 µs vs 80 µs). Classing wins when the padding ratio or the
    matrix is much larger (one dense row region otherwise pads every
    group globally).
    """

    blocks: list          # per class: (n_sg_c*GPS, S_c*br, BC)
    bcols: list           # per class: (n_sg_c*GPS*S_c,) int32 flat
    oidx: list            # per class: (n_sg_c,) int32 supergroup out position
    nrows: int
    ncols: int
    nnz: int
    br: int
    n_groups: int         # padded total (multiple of GPS)

    def tree_flatten(self):
        return ((self.blocks, self.bcols, self.oidx),
                (self.nrows, self.ncols, self.nnz, self.br, self.n_groups))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_col_blocks(self) -> int:
        return _round_up(self.ncols, BC) // BC

    @property
    def dtype(self):
        return self.blocks[0].dtype

    @property
    def bytes_streamed(self) -> int:
        return sum(b.size * b.dtype.itemsize for b in self.blocks)

    @staticmethod
    def from_csr(A: CsrMatrix, dtype=jnp.float32, n_classes: int = 3,
                 block_rows: int = BR) -> "BsrClassed":
        from itertools import combinations

        BRl = block_rows
        n_groups = _round_up(_round_up(A.nrows, BRl) // BRl, GPS)
        r, c, v = A.to_coo()
        keys = (r // BRl) * (1 << 32) + c // BC
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        uniq_mask = np.empty(keys_s.size, dtype=bool)
        uniq_mask[0] = True
        uniq_mask[1:] = keys_s[1:] != keys_s[:-1]
        pair_id = np.cumsum(uniq_mask) - 1
        uniq_keys = keys_s[uniq_mask]
        ugr = (uniq_keys >> 32).astype(np.int64)
        ucb = (uniq_keys & 0xFFFFFFFF).astype(np.int64)
        counts = np.bincount(ugr, minlength=n_groups)
        group_start = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(counts, out=group_start[1:])
        slot_of_pair = np.arange(ugr.size) - group_start[ugr]

        n_sg = n_groups // GPS
        sg_S = counts.reshape(n_sg, GPS).max(axis=1)
        smax = max(int(sg_S.max()), 1)

        # Exact byte-minimizing thresholds (small unique-S sets: brute force).
        uniq_S = [int(s) for s in np.unique(sg_S) if s > 0]
        best = (smax,)
        if len(uniq_S) > 1 and n_classes > 1:
            best_bytes = float("inf")
            for k in range(1, min(n_classes, len(uniq_S)) ):
                for combo in combinations([s for s in uniq_S if s < smax], k):
                    ths = np.array(sorted(combo) + [smax])
                    cost = ths[np.searchsorted(ths, sg_S)].sum()
                    if cost < best_bytes:
                        best_bytes, best = cost, tuple(ths)
        thresholds = list(best)

        cls_of_sg = np.searchsorted(np.array(thresholds), sg_S)
        blocks_l, bcols_l, oidx_l = [], [], []
        sg_of_pair = ugr // GPS
        rs, cs, vs = r[order], c[order], v[order]
        for ci, S_c in enumerate(thresholds):
            sgs = np.flatnonzero(cls_of_sg == ci)
            if sgs.size == 0:
                continue
            local_of_sg = np.full(n_sg, -1, dtype=np.int64)
            local_of_sg[sgs] = np.arange(sgs.size)
            bcols = np.zeros((sgs.size * GPS, S_c), dtype=np.int32)
            pmask = local_of_sg[sg_of_pair] >= 0
            lg = local_of_sg[sg_of_pair[pmask]] * GPS + ugr[pmask] % GPS
            bcols[lg, slot_of_pair[pmask]] = ucb[pmask]
            nmask = pmask[pair_id]  # nnz whose pair belongs to this class
            pr = pair_id[nmask]
            lgn = local_of_sg[sg_of_pair[pr]] * GPS + ugr[pr] % GPS
            shape = (sgs.size * GPS, S_c * BRl, BC)
            dest = (((lgn * S_c + slot_of_pair[pr]) * BRl
                     + rs[nmask] % BRl) * BC + cs[nmask] % BC)
            flat = sgs.size * GPS * S_c * BRl * BC
            if _device_build_wins(flat * jnp.dtype(dtype).itemsize, flat):
                blocks_l.append(_materialize_blocks(shape, dest, vs[nmask],
                                                    dtype))
            else:
                blocks = np.zeros(flat, dtype=np.float64)
                blocks[dest] = vs[nmask]
                blocks_l.append(jnp.asarray(blocks.reshape(shape),
                                            dtype=dtype))
            bcols_l.append(jnp.asarray(bcols.reshape(-1)))
            oidx_l.append(jnp.asarray(sgs, dtype=jnp.int32))

        return BsrClassed(blocks=blocks_l, bcols=bcols_l, oidx=oidx_l,
                          nrows=A.nrows, ncols=A.ncols, nnz=A.nnz, br=BRl,
                          n_groups=n_groups)

    def matvec(self, x: jax.Array) -> jax.Array:
        from lsbench_tpu.ops.spmv_pallas import spmv_bsr_classed
        return spmv_bsr_classed(self, x)

    def matvec_reference(self, x: jax.Array) -> jax.Array:
        """jnp oracle of the same math."""
        x_pad = jnp.zeros(self.n_col_blocks * BC, self.dtype).at[: self.ncols].set(
            x.astype(self.dtype))
        xb = x_pad.reshape(self.n_col_blocks, BC)
        y = jnp.zeros((self.n_groups, self.br), self.dtype)
        for blocks, bcols, oidx in zip(self.blocks, self.bcols, self.oidx):
            ng = blocks.shape[0]
            S = blocks.shape[1] // self.br
            gathered = xb[bcols.reshape(ng, S)]            # (ng, S, 128)
            blk = blocks.reshape(ng, S, self.br, BC)
            part = jnp.einsum("gsrc,gsc->gr", blk, gathered)
            rows = (oidx[:, None] * GPS + jnp.arange(GPS)[None, :]).reshape(-1)
            y = y.at[rows].set(part)
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
