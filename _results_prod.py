"""Regenerate RESULTS.md §5: the production solve paths on the reference
workload (TPU) — beyond the reference aliases' fixed protocols:

  - cg_ir + classical-AMG preconditioner to rtol 1e-10 (how SEM pressure
    solves are actually run; RESULTS §1 shows plain AMG cycles stall on
    this discretization, AMG-CG does not),
  - block_cg with 8 RHS (the MXU SpMM batch path, --nrhs 8).

Run on the TPU rig: python _results_prod.py
Checkpointed in _results_prod.jsonl (resumes where it left off).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

MATRICES = [
    "tj7a_A_12", "tj7a_A_15", "tj7a_A_18",
    "xn3b_A_10", "xn3b_A_12", "xn3b_A_15", "xn3b_A_18",
]
CONFIGS = {
    "amgcg_ir": ["--solver", "cg", "--precision", "fp32_ir",
                 "--precond", "amg_classical", "--rtol", "1e-10"],
    "block_cg_k8": ["--solver", "cg", "--nrhs", "8", "--rtol", "1e-10"],
    # Round 5: the Ginkgo role's multi-RHS form (batched BiCGSTAB —
    # k independent recurrences, one SpMM per half-step).
    "ginkgo_k8": ["--solver", "ginkgo", "--nrhs", "8", "--rtol", "1e-10"],
}
DATA_DIR = "/root/reference/tests"
CKPT = os.path.join(os.path.dirname(__file__), "_results_prod.jsonl")
TRIALS = 100


def _load_ckpt() -> dict:
    done = {}
    if os.path.exists(CKPT):
        with open(CKPT) as f:
            for line in f:
                rec = json.loads(line)
                done[(rec["matrix_key"], rec["config_key"])] = rec
    return done


def _run_one(matrix: str, key: str) -> dict:
    from lsbench_tpu.harness.cli import main
    argv = (["--matrix", os.path.join(DATA_DIR, f"{matrix}.txt"),
             "--trials", str(TRIALS), "--json"] + CONFIGS[key])
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    wall = time.perf_counter() - t0
    if rc != 0:
        raise RuntimeError(f"CLI rc={rc} for {matrix}/{key}\n{buf.getvalue()}")
    lines = buf.getvalue().strip().splitlines()
    rec = json.loads(lines[-1])
    rec["matrix_key"], rec["config_key"] = matrix, key
    rec["total_wall_s"] = wall
    return rec


def main() -> int:
    done = _load_ckpt()
    for m in MATRICES:
        for k in CONFIGS:
            if (m, k) in done:
                continue
            print(f"--- {m} / {k}", file=sys.stderr, flush=True)
            rec = _run_one(m, k)
            done[(m, k)] = rec
            with open(CKPT, "a") as f:
                f.write(json.dumps(rec) + "\n")

    print("| matrix | path | solve ms | per-RHS ms | iters | true_relres |")
    print("|---|---|---|---|---|---|")
    for m in MATRICES:
        for k in CONFIGS:
            r = done[(m, k)]
            nrhs = r.get("nrhs", 1)
            ms = r["solve_s"] * 1e3
            print(f"| {m} | {k} | {ms:.3f} | {ms / nrhs:.3f} | "
                  f"{r['iters']} | {r['true_relres']:.1e} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
