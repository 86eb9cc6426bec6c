"""Regenerate RESULTS.md §3: all six reference solver aliases x all seven
reference matrices, run via the CLI entry point with the reference protocol
(trials=100, RHS r[i]=i, default orderings — cusparse.c:181-197,
lsbench.c:96,158-160).

Run on the TPU rig:  python _results_cli.py
Partial results are checkpointed to _results_cli.jsonl so an interrupted
run resumes where it left off (keyed on matrix+solver).
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
# The six reference backends (lsbench.h:8-15), as registered aliases.
SOLVERS = ["cholmod", "cusolver", "hypre", "amgx", "paralmond", "ginkgo"]
DATA_DIR = "/root/reference/tests"
CKPT = os.path.join(os.path.dirname(__file__), "_results_cli.jsonl")
TRIALS = 100


def _load_ckpt() -> dict:
    done = {}
    if os.path.exists(CKPT):
        with open(CKPT) as f:
            for line in f:
                rec = json.loads(line)
                done[(rec["matrix_key"], rec["solver_key"])] = rec
    return done


def _run_one(matrix: str, solver: str) -> dict:
    from lsbench_tpu.harness.cli import main
    argv = ["--matrix", os.path.join(DATA_DIR, f"{matrix}.txt"),
            "--solver", solver, "--trials", str(TRIALS), "--json"]
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    wall = time.perf_counter() - t0
    if rc != 0:
        raise RuntimeError(f"CLI rc={rc} for {matrix}/{solver}\n{buf.getvalue()}")
    lines = buf.getvalue().strip().splitlines()
    rec = json.loads(lines[-1])            # the --json record
    rec["csv_line"] = lines[1]             # header is lines[0]
    rec["matrix_key"], rec["solver_key"] = matrix, solver
    rec["total_wall_s"] = wall
    return rec


def _fmt(rec: dict) -> str:
    tr = rec.get("true_relres")
    return (f"| {rec['matrix_key']} | {rec['solver_key']} | "
            f"{rec['solve_s'] * 1e3:.3f} | {rec['setup_s']:.2f} | "
            f"{rec['iters']} | {tr:.1e} | {rec['precision']} |")


def main() -> int:
    done = _load_ckpt()
    for m in MATRICES:
        for s in SOLVERS:
            if (m, s) in done:
                continue
            print(f"--- {m} / {s}", file=sys.stderr, flush=True)
            rec = _run_one(m, s)
            done[(m, s)] = rec
            with open(CKPT, "a") as f:
                f.write(json.dumps(rec) + "\n")

    print("| matrix | solver | solve ms | setup s | iters | true_relres | precision |")
    print("|---|---|---|---|---|---|---|")
    for m in MATRICES:
        for s in SOLVERS:
            print(_fmt(done[(m, s)]))
    print()
    print("CSV lines (reference schema ===matrix,n,nnz,trials,solver,ordering,elapsed===):")
    print("```")
    for m in MATRICES:
        for s in SOLVERS:
            print(done[(m, s)]["csv_line"])
    print("```")
    return 0


if __name__ == "__main__":
    sys.exit(main())
