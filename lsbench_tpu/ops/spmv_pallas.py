"""Pallas TPU SpMV over the BSR layout.

One grid step per 8-row group: its S dense (8,128) blocks are DMA'd
HBM→VMEM (auto-pipelined, double-buffered by pallas_call across grid
steps) while the full x vector sits resident in VMEM as a (n_col_blocks,
128) table. Block-column indices arrive via scalar prefetch
(PrefetchScalarGridSpec) so each step's x row is a dynamic VMEM index —
no gathers anywhere. The kernel is HBM-bandwidth bound on the streamed
blocks: bytes/SpMV = n_blocks * 4 KB.

Reference role: this replaces the vendored SpMV inside every reference
solver iteration (SURVEY.md §3 hot loops a/b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsbench_tpu.matrix.bsr import BC, BR, GPS, BsrClassed, BsrMatrix


def _kernel_onehot(x_ref, bcols_ref, blocks_ref, o_ref, *, slots: int):
    """Fully vectorized variant: gather all needed x rows with one MXU
    matmul against a one-hot selector built from the block-column ids.
    No scalar reads, no dynamic slicing — best when the x table is small
    (C = ncols/128 ≲ a few hundred; selector FLOPs scale with C).
    """
    C = x_ref.shape[0]
    T = GPS * slots
    cb = bcols_ref[:]                                           # (T,1) i32
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    onehot = (cb == cols_iota).astype(jnp.float32)              # (T,C)
    g = jnp.dot(onehot, x_ref[:], preferred_element_type=jnp.float32)  # (T,128)
    for gl in range(GPS):
        acc = jnp.zeros((BR, BC), dtype=jnp.float32)
        for s in range(slots):
            blk = blocks_ref[gl, s * BR:(s + 1) * BR, :]        # (8,128)
            acc = acc + blk * g[gl * slots + s][None, :]
        o_ref[gl] = jnp.sum(acc, axis=1)


def _kernel(idx_ref, x_ref, blocks_ref, o_ref, *, slots: int, br: int):
    """GPS row groups per step: o[gl] = sum_s blocks[gl,s] @ x[cols[gl,s]].

    idx_ref is the flattened (n_groups*S,) block-column array in SMEM
    (scalar prefetch); 1-D keeps it unpadded in SMEM. `br` is the block
    height: taller blocks amortize the per-slot dynamic x load (the
    dominant cost — ~15 cycles each) over more row FMAs.
    """
    step = pl.program_id(0)
    for gl in range(GPS):
        # Accumulate lane-wise across slots; one cross-lane reduction per
        # group (reductions are the VPU-expensive part).
        acc = jnp.zeros((br, BC), dtype=jnp.float32)
        for s in range(slots):  # static unroll; S is small (≤ ~16)
            cb = idx_ref[(step * GPS + gl) * slots + s]
            xb = x_ref[cb, :]                                    # (128,)
            blk = blocks_ref[gl, s * br:(s + 1) * br, :]         # (br,128)
            acc = acc + blk * xb[None, :]
        o_ref[gl] = jnp.sum(acc, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_bsr_onehot_call(block_cols, x_table, blocks, interpret=False):
    n_groups, sb, _ = blocks.shape
    slots = sb // BR
    grid_spec = pl.GridSpec(
        grid=(n_groups // GPS,),
        in_specs=[
            pl.BlockSpec((x_table.shape[0], BC), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS * slots, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPS, BR), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_onehot, slots=slots),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, BR), jnp.float32),
            interpret=interpret,
        )(x_table, block_cols.reshape(-1, 1), blocks)


@functools.partial(jax.jit, static_argnames=("br", "interpret", "g0", "g1"))
def _spmv_bsr_call(block_cols, x_table, blocks, br=BR, interpret=False,
                   g0=0, g1=None):
    """(g0, g1): STATIC group range this call computes — used by the SMEM
    chunking path (`_group_chunks`). The FULL blocks array is passed and
    the grid's block index map adds the static offset, so no ~stream-sized
    slice copy enters the program (a per-call dynamic slice of the 671 MB
    n=262k operator measured 3.2 ms/SpMV vs 1.1 ms unchunked).
    `block_cols` arrives already sliced to the chunk (KBs, cheap)."""
    n_groups_full, sb, _ = blocks.shape
    if g1 is None:
        g1 = n_groups_full
    off = g0 // GPS
    slots = sb // br
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((g1 - g0) // GPS,),
        in_specs=[
            # x table: whole vector resident in VMEM, same block every step.
            pl.BlockSpec((x_table.shape[0], BC), lambda g, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            # this step's GPS groups of blocks (auto double-buffered)
            pl.BlockSpec((GPS, sb, BC), lambda g, idx: (g + off, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPS, br), lambda g, idx: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    # Trace the kernel with x64 disabled: the library enables x64 globally
    # (fp64 reference semantics), but x64-traced pallas index maps emit i64
    # and crash the TPU AOT compiler. All kernel dtypes are explicit, so
    # this only affects internal index constants.
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel, slots=slots, br=br),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g1 - g0, br), jnp.float32),
            interpret=interpret,
        )(block_cols.reshape(-1), x_table, blocks)


def _kernel_selector(x_ref, sel_ref, blocks_ref, o_ref, *, slots: int,
                     br: int):
    """Selector variant: the x gather is ONE MXU matmul against a
    host-precomputed one-hot selector (0/1 matrix, static per layout) —
    g[t] = x_table[block_cols[t]]. Everything else is static slices, so
    nothing blocks on the scalar unit (the dynamic x_ref[cb,:] loads are
    what pin the prefetch variant at ~20 ns/slot)."""
    # HIGHEST precision: TPU matmuls default to bf16 operand rounding,
    # which silently costs ~3 digits on the gathered x (the root cause of
    # the "onehot variant incorrect on v5e" note — selector rows are exact
    # 0/1, but x gets rounded).
    g = jax.lax.dot_general(
        sel_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    for gl in range(GPS):
        acc = jnp.zeros((br, BC), dtype=jnp.float32)
        for s in range(slots):
            xb = g[gl * slots + s]                           # static row
            blk = blocks_ref[gl, s * br:(s + 1) * br, :]     # (br,128)
            acc = acc + blk * xb[None, :]
        o_ref[gl] = jnp.sum(acc, axis=1)


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def _spmv_bsr_selector_call(selector, x_table, blocks, br=BR,
                            interpret=False):
    n_groups, sb, _ = blocks.shape
    slots = sb // br
    T = GPS * slots
    grid_spec = pl.GridSpec(
        grid=(n_groups // GPS,),
        in_specs=[
            pl.BlockSpec((x_table.shape[0], BC), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, selector.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPS, br), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_selector, slots=slots, br=br),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, br), jnp.float32),
            interpret=interpret,
        )(x_table, selector, blocks)


def _kernel_classed(bcols_ref, oidx_ref, x_ref, blocks_ref, y_in_ref, o_ref,
                    *, slots: int, br: int):
    """Same slot-accumulation body as `_kernel`, but the output tile lands
    at a scalar-prefetched dynamic supergroup position (oidx_ref drives the
    out index_map, not the kernel body); y_in_ref is the aliased carry
    holding the other classes' tiles and is never read here."""
    del oidx_ref, y_in_ref
    step = pl.program_id(0)
    for gl in range(GPS):
        acc = jnp.zeros((br, BC), dtype=jnp.float32)
        for s in range(slots):
            cb = bcols_ref[(step * GPS + gl) * slots + s]
            xb = x_ref[cb, :]
            blk = blocks_ref[gl, s * br:(s + 1) * br, :]
            acc = acc + blk * xb[None, :]
        o_ref[gl] = jnp.sum(acc, axis=1)


@functools.partial(jax.jit, static_argnames=("br", "n_groups"))
def _spmv_bsr_classed_call(bcols, oidx, x_table, blocks, y_in, br, n_groups):
    n_loc, sb, _ = blocks.shape
    slots = sb // br
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_loc // GPS,),
        in_specs=[
            pl.BlockSpec((x_table.shape[0], BC), lambda g, bc, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g, bc, oi: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # aliased carry, untouched
        ],
        out_specs=pl.BlockSpec((GPS, br), lambda g, bc, oi: (oi[g], 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_classed, slots=slots, br=br),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, br), jnp.float32),
            input_output_aliases={4: 0},
        )(bcols, oidx, x_table, blocks, y_in)


def spmv_bsr_classed(A: BsrClassed, x: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """y = A @ x over the class-padded BSR layout (f32, TPU).

    Off-TPU (or interpret mode) this falls back to the jnp oracle — the
    aliasing pass-through semantics the chained calls rely on are a TPU
    buffer-donation behavior the interpreter doesn't model."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return A.matvec_reference(x)
    n_cb = A.n_col_blocks
    x_pad = jnp.zeros(n_cb * BC, dtype=jnp.float32).at[: A.ncols].set(
        x.astype(jnp.float32))
    x_table = x_pad.reshape(n_cb, BC)
    y = jnp.zeros((A.n_groups, A.br), jnp.float32)
    for bcols, oidx, blocks in zip(A.bcols, A.oidx, A.blocks):
        y = _spmv_bsr_classed_call(bcols, oidx, x_table, blocks, y,
                                   br=A.br, n_groups=A.n_groups)
    return y.reshape(-1)[: A.nrows]


# ----------------------------------------------------- multi-RHS (SpMM)

def _kernel_mm(idx_ref, x_ref, blocks_ref, o_ref, *, slots: int, br: int,
               k: int):
    """Y[gl] = sum_s blocks[gl,s] @ X[cols[gl,s]]ᵀ — the SpMV body with the
    per-slot product promoted from a VPU broadcast-multiply to an MXU
    dot_general over k right-hand sides. The streamed bytes are identical
    to SpMV; every extra RHS rides the same block DMA, so effective
    nnz/s scales ~k× until the MXU (not HBM) becomes the bound.
    Contraction is over the 128-lane axis of both operands:
    (br,128)·(k,128) → (br,k)."""
    step = pl.program_id(0)
    for gl in range(GPS):
        acc = jnp.zeros((br, k), dtype=jnp.float32)
        for s in range(slots):
            cb = idx_ref[(step * GPS + gl) * slots + s]
            xb = x_ref[cb]                                   # (k,128)
            blk = blocks_ref[gl, s * br:(s + 1) * br, :]     # (br,128)
            # HIGHEST precision: TPU matmuls otherwise round OPERANDS to
            # bf16 — measured 4.4e-3 relative error on v5e (fine in
            # interpret mode), which also stalls block_cg at ~1e-7. The
            # extra MXU passes are free: the kernel is HBM-bound.
            acc = acc + jax.lax.dot_general(
                blk, xb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        o_ref[gl] = acc


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def _spmm_bsr_call(block_cols, x_table, blocks, br=BR, interpret=False):
    n_groups, sb, _ = blocks.shape
    slots = sb // br
    n_cb, k, _ = x_table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups // GPS,),
        in_specs=[
            pl.BlockSpec((n_cb, k, BC), lambda g, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g, idx: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPS, br, k), lambda g, idx: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_mm, slots=slots, br=br, k=k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, br, k), jnp.float32),
            interpret=interpret,
        )(block_cols.reshape(-1), x_table, blocks)


def spmm_bsr(A: BsrMatrix, X: jax.Array, interpret: bool | None = None
             ) -> jax.Array:
    """Y = A @ X (f32). X: (ncols, k) → Y: (nrows, k).

    TPU-native block solve primitive: the reference's solvers are all
    single-RHS (lsbench.c:158-160 builds one r), but production pressure
    solves batch RHS; on TPU the batch is near-free because SpMV is
    HBM-bound on the streamed blocks (SURVEY §6 north star)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, k = X.shape
    n_cb = A.n_col_blocks
    X_pad = jnp.zeros((n_cb * BC, k), dtype=jnp.float32).at[: A.ncols].set(
        X.astype(jnp.float32))
    # (n_cb, k, BC): both matmul operands lane-major on the 128 columns.
    x_table = X_pad.reshape(n_cb, BC, k).transpose(0, 2, 1)
    y = _spmm_bsr_call(A.block_cols, x_table, A.blocks, br=A.br,
                       interpret=interpret)
    return y.reshape(-1, k)[: A.nrows]


# ------------------------------------------------------- double-float (f64)

def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + err exactly (round-to-nearest f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split_f32(a):
    """12-bit mantissa split: a = hi + lo with all hi/lo cross products
    exact in f32 (≤24 significand bits each). Implemented by bit-masking
    the low 12 mantissa bits — unlike the arithmetic Veltkamp split, this
    cannot be broken by compiler FMA contraction (XLA fuses `c - a` after
    `c = a*4097` into an FMA, which silently destroys the split)."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000),
                                      jnp.float32)
    return hi, a - hi


def _two_prod(a, b, protect: bool = False):
    """Dekker TwoProd: a * b = p + err exactly.

    `protect` pins p to the ROUNDED product with an optimization barrier:
    XLA's FMA contraction otherwise fuses later uses (e.g. TwoSum's
    `p - bb`) with the unrounded a*b, corrupting the compensated terms.
    Used on the interpret (XLA-compiled) path; Mosaic has no
    optimization_barrier primitive and does not contract across
    statements (accuracy verified on hardware in tests/bench)."""
    p = a * b
    if protect:
        p = jax.lax.optimization_barrier(p)
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _fast_two_sum(a, b):
    """Dekker FastTwoSum: exact a + b = s + err given |a| ≥ |b|."""
    s = a + b
    return s, b - (s - a)


def _df_add(ah, al, bh, bl):
    """Normalized double-float add: (ah,al) + (bh,bl) → (sh,sl) with
    |sl| ≲ ulp(sh). The renormalization (FastTwoSum) is what keeps the
    low words small — without it the low-order accumulator grows to the
    size of the TwoSum corrections and its own f32 rounding (~ulp of the
    corrections, not of the result) dominates (measured 6e-10 relative
    instead of ~1e-14)."""
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    return _fast_two_sum(s, e)


def _reduce_lanes_df(ah, al):
    """Double-float cross-lane tree sum: (br, W) pairs → (br,) pairs."""
    w = ah.shape[1]
    while w > 1:
        w //= 2
        ah, al = _df_add(ah[:, :w], al[:, :w], ah[:, w:2 * w], al[:, w:2 * w])
    return ah[:, 0], al[:, 0]


def _kernel_df64(idx_ref, xh_ref, xl_ref, bh_ref, bl_ref, oh_ref, ol_ref,
                 *, slots: int, br: int, protect: bool = False):
    """Double-float SpMV: operator and x held as (hi, lo) f32 pairs,
    products via TwoProd, accumulation via TwoSum — result error ~2⁻⁴⁹
    relative (the 48-bit double-float mantissa), vs ~2⁻²⁴ for plain f32.

    This is the fast TPU f64 path: the alternatives — gather ELL SpMV or
    selector matmuls in XLA-emulated f64 — measure 6.4 / 8.4 ms per SpMV
    on xn3b_A_10 (v5e), two orders of magnitude over this kernel's DMA
    bound (2x the f32 block stream).
    """
    step = pl.program_id(0)
    for gl in range(GPS):
        acc_h = jnp.zeros((br, BC), dtype=jnp.float32)
        acc_l = jnp.zeros((br, BC), dtype=jnp.float32)
        for s in range(slots):
            cb = idx_ref[(step * GPS + gl) * slots + s]
            xh = xh_ref[cb, :][None, :]                      # (1,128)
            xl = xl_ref[cb, :][None, :]
            Ah = bh_ref[gl, s * br:(s + 1) * br, :]          # (br,128)
            Al = bl_ref[gl, s * br:(s + 1) * br, :]
            p, e = _two_prod(Ah, xh, protect=protect)
            # Cross terms are ~2⁻²⁴ of the main product: their own rounding
            # lands at ~2⁻⁴⁸ — plain f32 products suffice. Al*xl ~2⁻⁴⁸: drop.
            cross = Ah * xl + Al * xh
            acc_h, acc_l = _df_add(acc_h, acc_l, p, e + cross)
        oh, ol = _reduce_lanes_df(acc_h, acc_l)
        oh_ref[gl] = oh
        ol_ref[gl] = ol


@functools.partial(jax.jit,
                   static_argnames=("br", "interpret", "g0", "g1"))
def _spmv_bsr_df64_call(block_cols, xh, xl, bh, bl, br=BR, interpret=False,
                        g0=0, g1=None):
    """(g0, g1): static group range for SMEM chunking — full block arrays
    with an offset index map, never a stream-sized slice (see
    _spmv_bsr_call)."""
    n_groups_full, sb, _ = bh.shape
    if g1 is None:
        g1 = n_groups_full
    off = g0 // GPS
    slots = sb // br
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((g1 - g0) // GPS,),
        in_specs=[
            pl.BlockSpec((xh.shape[0], BC), lambda g, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xl.shape[0], BC), lambda g, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g, idx: (g + off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPS, sb, BC), lambda g, idx: (g + off, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((GPS, br), lambda g, idx: (g, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((GPS, br), lambda g, idx: (g, 0),
                                memory_space=pltpu.VMEM)),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_df64, slots=slots, br=br,
                              protect=interpret),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((g1 - g0, br), jnp.float32),
                       jax.ShapeDtypeStruct((g1 - g0, br), jnp.float32)),
            interpret=interpret,
        )(block_cols.reshape(-1), xh, xl, bh, bl)


_SMEM_IDX_BUDGET_BYTES = 768 << 10
# v5e SMEM is 1 MiB; scalar-prefetched block-column ids beyond this budget
# are chunked into multiple pallas_calls over group ranges (the AOT
# compiler otherwise rejects the program: "Allocation would exceed memory
# (space=smem)" — hit at n=262k with AMD-permuted operators, whose
# scattered columns inflate G·S to ~3.4 MB of int32). 768 KiB is
# empirically safe: the n=262k RCM uniform layout's 655 KiB prefetch ran
# unchunked at full speed in round 3.


def _group_chunks(n_groups: int, S: int, interpret: bool = False):
    """Group ranges whose (chunk_groups·S) int32 prefetch fits SMEM."""
    del interpret  # chunking is correct (and testable) in interpret mode too
    if n_groups * S * 4 <= _SMEM_IDX_BUDGET_BYTES:
        return [(0, n_groups)]
    per = max(GPS, (_SMEM_IDX_BUDGET_BYTES // (4 * S)) // GPS * GPS)
    return [(g, min(g + per, n_groups)) for g in range(0, n_groups, per)]


def _df64_call_chunked(block_cols, xh, xl, bh, bl, br, interpret):
    chunks = _group_chunks(bh.shape[0], block_cols.shape[1], interpret)
    if len(chunks) == 1:
        return _spmv_bsr_df64_call(block_cols, xh, xl, bh, bl, br=br,
                                   interpret=interpret)
    # Slice ONLY the (KB-sized) prefetch ids; the block arrays pass whole
    # with a static grid offset — a per-call dynamic slice of the block
    # stream would copy it (measured 3x per-SpMV cost at n=262k).
    outs = [_spmv_bsr_df64_call(block_cols[g0:g1], xh, xl, bh, bl, br=br,
                                interpret=interpret, g0=g0, g1=g1)
            for g0, g1 in chunks]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


def spmv_bsr_df64(A, x: jax.Array, interpret: bool | None = None
                  ) -> jax.Array:
    """y = A @ x in double-float: x (f64) → y (f64), rel error ~2⁻⁴⁹."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cb = A.n_col_blocks
    x = x.astype(jnp.float64)
    x_pad = jnp.zeros(n_cb * BC, dtype=jnp.float64).at[: A.ncols].set(x)
    xh = x_pad.astype(jnp.float32)
    xl = (x_pad - xh.astype(jnp.float64)).astype(jnp.float32)
    yh, yl = _df64_call_chunked(
        A.block_cols, xh.reshape(n_cb, BC), xl.reshape(n_cb, BC),
        A.blocks_hi, A.blocks_lo, br=A.br, interpret=interpret)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(-1)[: A.nrows]


def spmv_bsr_df64_lo(A, blocks_lo: jax.Array, x: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """Double-float SpMV with the HI blocks taken from a BsrMatrix.

    `A` is the f32 BsrMatrix whose `blocks` ARE the df64 hi array (the f64
    values rounded once to f32 — bit-identical to BsrDf64.blocks_hi for
    the same layout); `blocks_lo` carries only the compensation term.
    Lets mixed-precision solvers (solvers/refine.py) ship one shared
    ~nnz-sized hi operand instead of duplicating it, cutting per-dispatch
    staging and VMEM pressure in the fused solve program."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cb = A.n_col_blocks
    x = x.astype(jnp.float64)
    x_pad = jnp.zeros(n_cb * BC, dtype=jnp.float64).at[: A.ncols].set(x)
    xh = x_pad.astype(jnp.float32)
    xl = (x_pad - xh.astype(jnp.float64)).astype(jnp.float32)
    yh, yl = _df64_call_chunked(
        A.block_cols, xh.reshape(n_cb, BC), xl.reshape(n_cb, BC),
        A.blocks, blocks_lo, br=A.br, interpret=interpret)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(-1)[: A.nrows]


def _kernel_compact(idx_ref, x_ref, blocks_ref, o_ref, *, bps: int):
    """Exact-block variant: K blocks per step, whole output resident in
    VMEM, per-block scatter-accumulate into its row group.

    idx_ref (SMEM, scalar prefetch) holds [gids | bcols] flattened; the
    output is zeroed on step 0 and accumulated across all steps (constant
    out index_map → block stays resident)."""
    step = pl.program_id(0)
    T = idx_ref.shape[0] // 2

    @pl.when(step == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    base = step * bps
    for k in range(bps):
        cb = idx_ref[T + base + k]
        xb = x_ref[cb, :]                                    # (128,)
        part = jnp.sum(blocks_ref[k] * xb[None, :], axis=1)  # (8,)
        g = idx_ref[base + k]
        o_ref[g, :] = o_ref[g, :] + part


@functools.partial(jax.jit, static_argnames=("n_groups", "interpret"))
def _spmv_bsr_compact_call(idx, x_table, blocks, n_groups, interpret=False):
    T, br, _ = blocks.shape
    bps = 16 if T % 16 == 0 else 8 if T % 8 == 0 else 4 if T % 4 == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // bps,),
        in_specs=[
            pl.BlockSpec((x_table.shape[0], BC), lambda g, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, BR, BC), lambda g, idx: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_groups, BR), lambda g, idx: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel_compact, bps=bps),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, BR), jnp.float32),
            interpret=interpret,
        )(idx, x_table, blocks)


def spmv_bsr_compact(A, x: jax.Array, interpret: bool | None = None
                     ) -> jax.Array:
    """y = A @ x over the exact-block BsrCompact layout (f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cb = A.n_col_blocks
    x_pad = jnp.zeros(n_cb * BC, dtype=jnp.float32).at[: A.ncols].set(
        x.astype(jnp.float32))
    idx = jnp.concatenate([A.gids, A.bcols])
    y = _spmv_bsr_compact_call(idx, x_pad.reshape(n_cb, BC), A.blocks,
                               A.n_groups, interpret=interpret)
    return y.reshape(-1)[: A.nrows]


def spmv_bsr(A: BsrMatrix, x: jax.Array, interpret: bool | None = None,
             variant: str = "auto") -> jax.Array:
    """y = A @ x (f32). x: (ncols,) → y: (nrows,)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_cb = A.n_col_blocks
    x_pad = jnp.zeros(n_cb * BC, dtype=jnp.float32).at[: A.ncols].set(
        x.astype(jnp.float32))
    x_table = x_pad.reshape(n_cb, BC)
    if variant == "auto":
        # Prefetch wins on v5e: the dynamic x loads pipeline at ~5 cycles
        # each and hide entirely under the block DMA (measured 65 µs vs
        # 75 µs selector on xn3b_A_10 — the selector's extra stream and
        # HIGHEST-precision gather matmul cost more than the loads).
        variant = "prefetch"
    if variant == "selector":
        A.ensure_sel()
        y = _spmv_bsr_selector_call(A.sel, x_table, A.blocks, br=A.br,
                                    interpret=interpret)
    elif variant == "onehot":
        # In-kernel one-hot build: measured incorrect on v5e hardware (fine
        # in interpret mode); kept for comparison only.
        y = _spmv_bsr_onehot_call(A.block_cols, x_table, A.blocks,
                                  interpret=interpret)
    else:
        chunks = _group_chunks(A.blocks.shape[0], A.block_cols.shape[1],
                               interpret)
        if len(chunks) == 1:
            y = _spmv_bsr_call(A.block_cols, x_table, A.blocks, br=A.br,
                               interpret=interpret)
        else:
            y = jnp.concatenate(
                [_spmv_bsr_call(A.block_cols[g0:g1], x_table, A.blocks,
                                br=A.br, interpret=interpret, g0=g0, g1=g1)
                 for g0, g1 in chunks])
    return y.reshape(-1)[: A.nrows]
