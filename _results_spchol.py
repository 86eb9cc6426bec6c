"""Regenerate RESULTS.md §4's sparse-direct rows (VERDICT r3 next 2).

Measures the GENERAL sparse direct path (host AMD + etree/reach symbolic +
native left-looking numeric factor, device segmented level-scheduled
triangular sweeps + df64 refinement on TPU) at beyond-reference scale:

  - n=262,144 2-D Poisson (banded after AMD — the structured case), and
  - n=263,169 SEM-type irregular SPD (matrix/generate.py::sem_2d — element
    cliques, 9/15/25-wide row classes; the 'class skew and halo width
    actually bite' case VERDICT r3 missing 6 asks for),

plus the reference-default route `--solver cholmod` auto-delegating here.
Writes _results_spchol.jsonl. Run on the TPU rig: python _results_spchol.py
(falls back to CPU fp64 sweeps off-rig — the record carries the backend).
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "_results_spchol.jsonl"


def run_case(name, A, trials=5, schedule="block", nrhs=0):
    import jax

    from lsbench_tpu.solvers.sparse_cholesky import SparseCholeskySolver
    from lsbench_tpu.utils import host_fence

    b = np.arange(A.nrows, dtype=np.float64)
    if nrhs:
        rng = np.random.default_rng(0)
        b = np.column_stack([b] + [rng.standard_normal(A.nrows)
                                   for _ in range(nrhs - 1)])
    t0 = time.perf_counter()
    s = SparseCholeskySolver(A, ordering="amd", schedule=schedule)
    setup_s = time.perf_counter() - t0

    fn = s.solve_fn()
    t0 = time.perf_counter()
    host_fence(fn(b))
    first_call_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(trials):
        out = fn(b)
    host_fence(out)
    solve_s = (time.perf_counter() - t0) / trials

    res = s.solve(b)
    true_rel = res.relres
    rec = {
        "case": name, "n": A.nrows, "nnz": A.nnz,
        "schedule": schedule, "nrhs": nrhs or 1,
        "blocks": s.n_blocks,
        "backend": jax.default_backend(),
        "setup_s": round(setup_s, 2),
        "setup_breakdown": {k: round(v, 2)
                            for k, v in s.setup_breakdown.items()},
        "fill_nnz": s.fill_nnz,
        "levels": [s.n_levels_f, s.n_levels_b],
        "pad_waste": round(float(s.pad_waste), 2),
        "first_call_s": round(first_call_s, 2),
        "solve_ms": round(solve_s * 1e3, 2),
        "true_relres": float(true_rel),
    }
    print(json.dumps(rec))
    return rec


def main():
    from lsbench_tpu.matrix.generate import poisson_2d, sem_2d
    from lsbench_tpu.matrix.io import read_matrix

    recs = []
    # Reference-scale smoke (fast; catches route breakage off-rig) —
    # blocked schedule (the round-5 partitioned-inverse sweep), the
    # round-4 level schedule, and the native host-CPU solve baseline
    # (the CHOLMOD role's actual timed region, cholmod-impl.h:44-63).
    Aref = read_matrix("/root/reference/tests/xn3b_A_18.txt")
    for sched in ("block", "level", "host"):
        recs.append(run_case(f"xn3b_A_18 [{sched}]", Aref, schedule=sched))
    # Beyond-reference: banded + irregular, all three schedules + the
    # multi-RHS amortization row (factor once / solve repeatedly).
    for sched in ("block", "level", "host"):
        recs.append(run_case(f"poisson_512 (n=262k banded) [{sched}]",
                             poisson_2d(512), trials=3, schedule=sched))
    recs.append(run_case("poisson_512 [block, nrhs=8]", poisson_2d(512),
                         trials=3, schedule="block", nrhs=8))
    for sched in ("block", "host"):
        recs.append(run_case(
            f"sem_256_p2 (n=263k irregular SEM) [{sched}]",
            sem_2d(256, 2), trials=3, schedule=sched))

    # The reference-default route: --solver cholmod above the dense guard
    # must auto-delegate here (direct.py) — record that the route works
    # at scale end-to-end.
    from lsbench_tpu.solvers.base import get_solver
    cls, p = get_solver("cholmod")
    A = poisson_2d(512)
    b = np.arange(A.nrows, dtype=np.float64)
    t0 = time.perf_counter()
    s = cls(A, **p)
    res = s.solve(b)
    recs.append({"case": "cholmod alias auto-delegation (n=262k)",
                 "delegated": res.extra.get("delegated"),
                 "setup_plus_first_solve_s": round(time.perf_counter() - t0,
                                                   2),
                 "true_relres": float(res.relres)})
    print(json.dumps(recs[-1]))

    with open(OUT, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
