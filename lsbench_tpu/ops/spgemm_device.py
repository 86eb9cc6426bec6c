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
    """Host-built symbolic plan for C = A @ B (pattern + expansion map)."""
    a_idx: jax.Array      # (T,) index into A.vals per expansion pair
    b_idx: jax.Array      # (T,) index into B.vals
    out_idx: jax.Array    # (T,) destination nnz slot in C
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
            out_idx=jnp.zeros(1, jnp.int32),
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
    return SpgemmPlan(
        a_idx=jnp.asarray(a_idx, jnp.int32),
        b_idx=jnp.asarray(b_idx, jnp.int32),
        out_idx=jnp.asarray(inv, jnp.int32),
        offs=offs, cols=c_cols, nrows=A.nrows, ncols=B.ncols,
        nnz=uniq.size)


def spgemm_numeric(plan: SpgemmPlan, a_vals, b_vals):
    """Device numeric pass (jittable): C values in plan order."""
    if plan.nnz == 0:
        return jnp.zeros(0, dtype=jnp.result_type(a_vals, b_vals))
    contrib = a_vals[plan.a_idx] * b_vals[plan.b_idx]
    return jax.ops.segment_sum(contrib, plan.out_idx,
                               num_segments=plan.nnz)


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
