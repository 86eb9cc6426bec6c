"""Observability: jax.profiler tracing + per-kernel roofline reporting.

The reference's only observability is wall-of-clock() timing and device
syncs (SURVEY.md §5); here every SpMV layout knows its streamed bytes, so
the harness can report achieved vs speed-of-light HBM bandwidth per kernel
(the BASELINE.json north-star metric).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

from lsbench_tpu.utils import host_fence

# Peak HBM bandwidth (GB/s) per chip by device kind, for roofline denominators.
HBM_GBPS = {
    "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6 lite": 1640.0, "v6e": 1640.0, "v3": 900.0, "v2": 700.0,
}
DEFAULT_HBM_GBPS = 819.0


def device_hbm_gbps() -> float:
    kind = (jax.devices()[0].device_kind or "").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return DEFAULT_HBM_GBPS


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _chain_wall(fn, x, chain: int, reps: int) -> float:
    """Median wall seconds of ONE dispatch of `chain` dependent fn steps."""

    @jax.jit
    def chained(v):
        def body(_, u):
            y = fn(u)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, chain, body, v)

    host_fence(chained(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        host_fence(chained(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def time_op(fn, x, chain: int = 100, reps: int = 5) -> float:
    """Steady-state seconds per application of fn.

    Slope method: wall(c) = dispatch_latency + c * t_op measured at two
    chain lengths; the slope removes the per-dispatch latency. Through the
    remote-TPU tunnel that latency is ~30 ms — dividing a single chained
    dispatch by `chain` (the round-1 approach) under-reported a 64 µs
    kernel 6x. `chain` is the longer of the two lengths.
    """
    c1 = max(chain // 5, 1)
    c2 = max(chain, c1 + 1)
    w1 = _chain_wall(fn, x, c1, reps)
    w2 = _chain_wall(fn, x, c2, reps)
    return max((w2 - w1) / (c2 - c1), 1e-12)


def spmv_roofline(op, x, nnz: int, stream_bytes: int, chain: int = 100) -> dict:
    """Measure one SpMV operator against the HBM roofline.

    Returns dict with seconds, Gnnz/s, achieved GB/s, and utilization of
    peak HBM bandwidth (1.0 = speed of light for this layout's traffic).
    """
    sec = time_op(op, x, chain=chain)
    gbps = stream_bytes / sec / 1e9
    peak = device_hbm_gbps()
    return {
        "spmv_s": sec,
        "gnnz_per_s": nnz / sec / 1e9,
        "achieved_gbps": gbps,
        "peak_gbps": peak,
        "hbm_utilization": gbps / peak,
        "stream_bytes": stream_bytes,
    }
