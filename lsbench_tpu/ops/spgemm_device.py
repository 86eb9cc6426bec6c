"""Two-pass SpGEMM: host symbolic, device (TPU) numeric — SURVEY.md §7.5.

The Galerkin product's sparsity pattern is static per hierarchy, so the
symbolic pass (pattern + expansion plan) runs once on host, and the
numeric pass is a pure static-shaped device computation:

    c_vals[out_idx[t]] += a_vals[a_idx[t]] * b_vals[b_idx[t]]

i.e. two gathers, one multiply, one `segment_sum` — XLA-friendly, no
dynamic output sparsity anywhere (the classic obstacle to device SpGEMM,
SURVEY.md §7 "hard parts" item 2). The reference does its RAP inside
Hypre on device (hypre.c:97); this is the TPU-native equivalent for
re-forming coarse operators when only VALUES change (same pattern), e.g.
parameter-dependent re-assembly, without leaving the device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix


@dataclass
class SpgemmPlan:
    """Host-built symbolic plan for C = A @ B (pattern + expansion map).

    Expansion triples are SORTED by destination slot; the numeric pass
    reduces them by cumsum-diff (one prefix sum + two gathers) off-TPU,
    or by a sorted scatter segment_sum at f64 on TPU — see
    spgemm_numeric_idx for the measured trade-offs.
    """
    a_idx: jax.Array      # (T,) index into A.vals, sorted by dest slot
    b_idx: jax.Array      # (T,) index into B.vals, same order
    out_idx: jax.Array    # (T,) destination nnz slot in C (sorted)
    ends: jax.Array       # (nnz,) index of each slot's LAST triple
    offs: np.ndarray      # C pattern (host)
    cols: np.ndarray
    nrows: int
    ncols: int
    nnz: int


def spgemm_symbolic(A: CsrMatrix, B: CsrMatrix) -> SpgemmPlan:
    """Symbolic pass: expansion triples + deduplicated output pattern."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    a_rows = A.row_indices()
    counts = (B.offs[A.cols + 1] - B.offs[A.cols]).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        plan_empty = SpgemmPlan(
            a_idx=jnp.zeros(1, jnp.int32), b_idx=jnp.zeros(1, jnp.int32),
            out_idx=jnp.zeros(1, jnp.int32), ends=jnp.zeros(1, jnp.int32),
            offs=np.zeros(A.nrows + 1, dtype=np.int64),
            cols=np.zeros(0, dtype=np.int64),
            nrows=A.nrows, ncols=B.ncols, nnz=0)
        return plan_empty
    a_idx = np.repeat(np.arange(A.nnz, dtype=np.int64), counts)
    starts = B.offs[A.cols].astype(np.int64)
    ends = np.cumsum(counts)
    b_idx = (np.arange(total, dtype=np.int64)
             - np.repeat(ends - counts, counts) + np.repeat(starts, counts))
    out_i = np.repeat(a_rows, counts)
    out_j = B.cols[b_idx]

    key = out_i * np.int64(B.ncols) + out_j
    uniq, inv = np.unique(key, return_inverse=True)
    c_rows = (uniq // B.ncols).astype(np.int64)
    c_cols = (uniq % B.ncols).astype(np.int64)
    offs = np.zeros(A.nrows + 1, dtype=np.int64)
    np.cumsum(np.bincount(c_rows, minlength=A.nrows), out=offs[1:])
    # Sort expansion triples by destination slot (stable) and record the
    # per-slot last-triple positions for the cumsum-diff reduction.
    order = np.argsort(inv, kind="stable")
    ends = np.cumsum(np.bincount(inv, minlength=uniq.size)) - 1
    return SpgemmPlan(
        a_idx=jnp.asarray(a_idx[order], jnp.int32),
        b_idx=jnp.asarray(b_idx[order], jnp.int32),
        out_idx=jnp.asarray(inv[order], jnp.int32),
        ends=jnp.asarray(ends, jnp.int32),
        offs=offs, cols=c_cols, nrows=A.nrows, ncols=B.ncols,
        nnz=uniq.size)


def spgemm_numeric(plan: SpgemmPlan, a_vals, b_vals):
    """Device numeric pass (jittable): C values in plan order."""
    return spgemm_numeric_idx(plan.a_idx, plan.b_idx, plan.out_idx,
                              plan.ends, plan.nnz, a_vals, b_vals)


@dataclass
class RapPlan:
    """Composed device plan for the Galerkin triple product R A P."""
    ra: SpgemmPlan
    rap: SpgemmPlan


def rap_symbolic(R: CsrMatrix, A: CsrMatrix, P: CsrMatrix) -> RapPlan:
    """Symbolic RAP: pattern of RA (with PLACEHOLDER values — the pattern
    is value-independent since expansion keeps structural zeros), then of
    (RA)·P."""
    ra = spgemm_symbolic(R, A)
    RA_pattern = CsrMatrix(nrows=ra.nrows, ncols=ra.ncols, offs=ra.offs,
                           cols=ra.cols, vals=np.ones(max(ra.nnz, 1)))
    rap = spgemm_symbolic(RA_pattern, P)
    return RapPlan(ra=ra, rap=rap)


def rap_numeric(plan: RapPlan, r_vals, a_vals, p_vals):
    """Device numeric RAP (jittable): coarse-operator values."""
    ra_vals = spgemm_numeric(plan.ra, r_vals, a_vals)
    return spgemm_numeric(plan.rap, ra_vals, p_vals)


def _df_split64(v):
    """f64 → (hi, lo) f32 pair with hi + lo == v to f32-pair precision."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def spgemm_numeric_idx(a_idx, b_idx, out_idx, ends, nnz: int,
                       a_vals, b_vals):
    """spgemm_numeric with the expansion indices as EXPLICIT arguments.

    Closing over the plan arrays bakes them into the executable as HLO
    literal constants — at n=262k the RAP expansion triples run to
    hundreds of MB and the remote-TPU compile tunnel rejects the program
    (HTTP 413; same constraint as Solver.solve_fn_args). Pass them as jit
    arguments instead; only `nnz` is static.

    Reduction: cumsum-diff over the slot-sorted triples (two gathers +
    one prefix sum) off-TPU; on TPU at f64 it falls back to the scatter
    segment_sum — an emulated-f64 cumsum at this size (6.4M elements,
    level-0 RAP at n=262k) SIGSEGVs the TPU AOT compiler, and a
    compensated double-float associative_scan, while numerically right,
    compiles for tens of minutes through the remote-compile tunnel. The
    f64 scatter measures 1.5 s for the 6.4M-pair level-0 product on v5e
    (~4M updates/s — TPU scatter serializes) and compiles in seconds."""
    if nnz == 0:
        return jnp.zeros(0, dtype=jnp.result_type(a_vals, b_vals))
    out_dtype = jnp.result_type(a_vals, b_vals)
    contrib = a_vals[a_idx] * b_vals[b_idx]
    if (out_dtype == jnp.dtype(jnp.float64)
            and jax.default_backend() == "tpu"):
        # NOTE: no indices_are_sorted hint — measured SLOWER with it on
        # v5e (2.04 s vs 1.53 s for the 6.4M-pair product).
        return jax.ops.segment_sum(contrib, out_idx, num_segments=nnz)
    seg = jnp.cumsum(contrib)[ends]
    return jnp.diff(seg, prepend=jnp.zeros(1, seg.dtype)).astype(out_dtype)


def rap_numeric_idx(plan_idx, nnz_ra: int, nnz_rap: int,
                    r_vals, a_vals, p_vals):
    """Device numeric RAP with plan indices as arguments (see
    spgemm_numeric_idx). `plan_idx` is the 8-tuple
    (ra.a_idx, ra.b_idx, ra.out_idx, ra.ends,
     rap.a_idx, rap.b_idx, rap.out_idx, rap.ends)."""
    (ra_ai, ra_bi, ra_oi, ra_en,
     rap_ai, rap_bi, rap_oi, rap_en) = plan_idx
    ra_vals = spgemm_numeric_idx(ra_ai, ra_bi, ra_oi, ra_en, nnz_ra,
                                 r_vals, a_vals)
    return spgemm_numeric_idx(rap_ai, rap_bi, rap_oi, rap_en, nnz_rap,
                              ra_vals, p_vals)


def rap_device(R: CsrMatrix, A: CsrMatrix, P: CsrMatrix) -> CsrMatrix:
    """Galerkin RAP with the numeric phase on device; returns host CSR."""
    plan = rap_symbolic(R, A, P)
    # Eager call: plan holds static host metadata (not a pytree); the
    # gathers/segment_sum inside still execute on the default device. To
    # jit, close over the plan: jax.jit(lambda rv, av, pv:
    # rap_numeric(plan, rv, av, pv)).
    vals = np.asarray(rap_numeric(plan, jnp.asarray(R.vals),
                                  jnp.asarray(A.vals), jnp.asarray(P.vals)))
    return CsrMatrix(nrows=plan.rap.nrows, ncols=plan.rap.ncols,
                     offs=plan.rap.offs, cols=plan.rap.cols,
                     vals=np.asarray(vals, dtype=np.float64))
