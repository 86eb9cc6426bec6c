"""Static per-iteration communication accounting + ICI scaling model.

The reference has no distributed path to measure (MPI neutered,
paralmond.cpp:94-102; SURVEY.md §2.2), and this rig exposes one real chip,
so multi-chip efficiency cannot be measured here directly. What CAN be
produced honestly:

1. **Exact communication volumes** — every distributed solver's per-
   iteration collective schedule is STATIC (built at setup from the halo /
   2-D plans), so bytes-moved and collective counts are known without
   running anything. `cg_comm_volume` / `cg2d_comm_volume` derive them
   from the same plan objects the solvers use; a trace-count test
   (tests/test_comm_model.py) asserts the accounting matches the
   collectives the solvers actually issue.

2. **A parameterized ICI model** — `predict_efficiency` combines the
   volumes with (a) the MEASURED single-chip per-iteration time and
   (b) published v5e ICI parameters (default 45 GB/s usable per link
   direction, ~1 µs per ring hop) into a strong-scaling efficiency
   prediction:

       t_D = t_1/D  +  bytes_per_spmv/link_bw  +  hop_lat · hops(D)
       eff = (t_1/D) / t_D

   hops(D): a fused psum (all-reduce of ≤3 scalars) is latency-bound —
   2·(D−1) ring hops; each halo ppermute is 1 hop (simultaneous left/
   right on the bidirectional ring). Compute splits as t_1/D because the
   single-chip kernel is HBM-bound (RESULTS.md §2) and HBM scales with
   chips.

The model's structural message (RESULTS.md §7): reference-sized systems
(n ≤ 6.4k, 22-30 µs/iter) are LATENCY-bound — psum hops eat the
per-device compute almost immediately, so multi-chip parallelism cannot
pay at this size; the ≥80%-efficiency regime starts at the n where
t_1/D ≥ 4·t_comm (a few hundred thousand rows at 8 chips).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.parallel.dist_spmv import build_halo_plan


@dataclass
class CommVolume:
    """Per-device, per-CG-iteration communication of a distributed solver."""
    strategy: str            # halo | all_gather | 2d
    n_devices: int
    halo: int | None         # H (halo strategy only)
    bytes_per_spmv: int      # payload bytes moved per device per SpMV
    ppermutes_per_spmv: int  # point-to-point exchanges per SpMV
    psums_per_iter: int      # fused scalar all-reduces per CG iteration
    psum_scalars: int        # total scalars carried by those psums

    @property
    def bytes_per_iter(self) -> int:
        # 1 SpMV per CG iteration + the psum payloads (f64 scalars).
        return self.bytes_per_spmv + self.psum_scalars * 8


def cg_comm_volume(A: CsrMatrix, n_devices: int, dtype=jnp.float32,
                   strategy: str = "auto", row_align: int = 8) -> CommVolume:
    """Distributed-CG (parallel/dist_cg.py) communication, derived from
    the SAME halo plan the solver builds. Counts per iteration:
    1 SpMV (2 ppermutes of H rows on the halo path, or one all_gather
    of the complement on the fallback) + 2 fused psums (p·Ap, then
    r·z with r·r batched — 3 scalars total)."""
    itemsize = jnp.dtype(dtype).itemsize
    plan = build_halo_plan(A, n_devices, dtype, row_align=row_align)
    use_halo = strategy == "halo" or (strategy == "auto"
                                      and not plan.needs_all_gather)
    if n_devices == 1:
        # Collectives on a 1-device mesh move nothing.
        return CommVolume("halo" if use_halo else "all_gather", 1,
                          plan.halo if use_halo else None, 0,
                          2 if use_halo else 0, 2, 3)
    if use_halo:
        return CommVolume("halo", n_devices, plan.halo,
                          2 * plan.halo * itemsize, 2, 2, 3)
    return CommVolume("all_gather", n_devices, None,
                      (plan.n_pad - plan.nloc) * itemsize, 0, 2, 3)


def cg2d_comm_volume(A: CsrMatrix, pr: int, pc: int,
                     dtype=jnp.float32) -> CommVolume:
    """2-D distributed CG (parallel/dist2d.py): per SpMV one all_gather
    over ROWS ((pr−1)·csize inbound) + one psum_scatter over COLS
    ((pc−1)·csize outbound-equivalent on a ring); 2 fused psums over the
    whole mesh per iteration."""
    from lsbench_tpu.parallel.dist2d import build_2d_plan
    itemsize = jnp.dtype(dtype).itemsize
    plan = build_2d_plan(A, pr, pc, dtype)
    bytes_spmv = ((pr - 1) + (pc - 1)) * plan.csize * itemsize
    return CommVolume("2d", pr * pc, None, bytes_spmv,
                      0, 2, 3)


def predict_efficiency(t1_iter_s: float, cv: CommVolume,
                       link_gbps: float = 45.0,
                       hop_latency_s: float = 1e-6):
    """Strong-scaling prediction: (efficiency, t_iter_at_D seconds).

    `t1_iter_s` is the MEASURED single-chip per-iteration wall time (the
    HBM-bound kernel — RESULTS.md §2/§6); defaults are v5e ICI numbers
    (45 GB/s usable per link direction, ~1 µs/hop)."""
    D = cv.n_devices
    if D == 1:
        return 1.0, t1_iter_s
    t_bw = cv.bytes_per_spmv / (link_gbps * 1e9)
    hops = cv.psums_per_iter * 2 * (D - 1) + cv.ppermutes_per_spmv // 2
    t_lat = hops * hop_latency_s
    t_d = t1_iter_s / D + t_bw + t_lat
    return (t1_iter_s / D) / t_d, t_d


def efficiency_crossover_n(nnz_per_row: float, gnnz_per_s: float,
                           n_devices: int, target: float = 0.8,
                           halo_rows: int = 64, dtype=jnp.float32,
                           link_gbps: float = 45.0,
                           hop_latency_s: float = 1e-6) -> int:
    """Smallest n where the model predicts ≥`target` efficiency at
    `n_devices` chips, for a banded operator with the given density and
    the measured single-chip SpMV throughput (Gnnz/s → t_1 per CG
    iteration ≈ nnz / rate). Solved by bisection on n."""
    itemsize = jnp.dtype(dtype).itemsize

    def eff(n):
        t1 = (n * nnz_per_row) / (gnnz_per_s * 1e9)
        cv = CommVolume("halo", n_devices, halo_rows,
                        2 * halo_rows * itemsize, 2, 2, 3)
        return predict_efficiency(t1, cv, link_gbps, hop_latency_s)[0]

    lo, hi = 1_000, 1_000_000_000
    if eff(hi) < target:
        return -1
    while hi - lo > max(1000, lo // 100):
        mid = (lo + hi) // 2
        if eff(mid) >= target:
            hi = mid
        else:
            lo = mid
    return hi
