"""Regenerate RESULTS.md §7: scaling evidence (VERDICT r3 next 1).

One real chip is reachable from this rig, so multi-chip ICI efficiency
cannot be measured directly. The artifact therefore has three honest
parts, each checked by tests:

1. CPU-simulated device sweep (1/2/4/8 devices; halo vs all_gather vs
   2-D mesh) of fixed-iteration distributed CG — this validates the
   exact shard_map/collective code paths that would run over ICI
   (timings validate the PATH, not ICI bandwidth; the simulated
   "collectives" are memcpys, so the efficiency column mostly shows
   sharding overhead on a shared-memory host).
2. Static per-iteration communication volumes derived from the same
   halo/2-D plans the solvers execute (parallel/comm_model.py; the
   trace-count tests in tests/test_comm_model.py pin these to the
   collectives actually issued).
3. The measured-parameter ICI model: single-chip per-iteration wall
   times measured on the v5e (RESULTS.md §2/§6) + v5e ICI parameters
   (45 GB/s usable per link direction, ~1 µs per ring hop) → predicted
   strong-scaling efficiency at 2-8 chips, and the n where 80%
   efficiency is reached.

Run: python _results_scale_sweep.py       (~2 min, CPU only — safe off-rig)
Writes _results_scale_sweep.jsonl and prints the §7 markdown tables.
"""

from __future__ import annotations

import json
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REF_DIR = "/root/reference/tests"
OUT = "_results_scale_sweep.jsonl"

# Measured single-chip per-iteration wall times (v5e, RESULTS.md):
#  - reference workload: cg_ir inner iteration 22.8 µs (xn3b_A_10, §6)
#  - n=262k Poisson: classed f32 SpMV 831 µs (§4) — the CG iteration is
#    SpMV-dominated at this size.
T1_REF_S = 22.8e-6
T1_262K_S = 831e-6
GNNZ_262K = 1.58  # measured classed-layout SpMV rate at 5 nnz/row (§4)


def sweep_tables():
    from lsbench_tpu.harness.scale import run_sweep
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.matrix.io import read_matrix

    rows = []
    A_ref = read_matrix(f"{REF_DIR}/xn3b_A_10.txt")
    # auto+rcm: halo rides the RCM band while it fits (d ≤ 4; at d=8 the
    # 1024-wide band exceeds the 808-row block and the plan falls back to
    # all_gather — a physical limit of the reference matrix, recorded).
    for strategy, ordering in (("auto", "rcm"), ("all_gather", "none")):
        for r in run_sweep(A_ref, [1, 2, 4, 8], iters=60, reps=3,
                           strategy=strategy, ordering=ordering,
                           mesh2d=(strategy == "auto")):
            rows.append({"matrix": "xn3b_A_10", "n": A_ref.nrows,
                         "nnz": A_ref.nnz, "ordering": ordering, **r})

    A_big = poisson_2d(512)
    for r in run_sweep(A_big, [1, 2, 4, 8], iters=30, reps=3,
                       strategy="halo", ordering="rcm", mesh2d=True):
        rows.append({"matrix": "poisson_512", "n": A_big.nrows,
                     "nnz": A_big.nnz, "ordering": "rcm", **r})
    return rows


def model_tables():
    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.matrix.io import read_matrix
    from lsbench_tpu.ordering.rcm import rcm_ordering
    from lsbench_tpu.parallel.comm_model import (cg_comm_volume,
                                                 efficiency_crossover_n,
                                                 predict_efficiency)

    rows = []
    A_ref = read_matrix(f"{REF_DIR}/xn3b_A_10.txt")
    A_ref = A_ref.permuted(rcm_ordering(A_ref))
    A_big = poisson_2d(512)
    A_big = A_big.permuted(rcm_ordering(A_big))
    for name, A, t1 in (("xn3b_A_10 (rcm)", A_ref, T1_REF_S),
                        ("poisson_512 (rcm)", A_big, T1_262K_S)):
        for d in (2, 4, 8):
            cv = cg_comm_volume(A, d, jnp.float32)
            eff, t_d = predict_efficiency(t1, cv)
            rows.append({"case": name, "devices": d,
                         "strategy": cv.strategy, "halo": cv.halo,
                         "bytes_per_spmv": cv.bytes_per_spmv,
                         "psums_per_iter": cv.psums_per_iter,
                         "t1_us": round(t1 * 1e6, 1),
                         "t_d_us": round(t_d * 1e6, 2),
                         "pred_efficiency": round(eff, 3)})
    n80 = {d: efficiency_crossover_n(5.0, GNNZ_262K, d)
           for d in (2, 4, 8)}
    return rows, n80


def amg_tables():
    """AMG-CG-IR scaling story (VERDICT r4 missing 1): the flagship
    production path's V-cycle collective schedule, halo vs all_gather,
    accounted exactly (amg_comm_volume, trace-pinned) and timed on the
    8-device sim mesh; plus the ICI-model prediction for one AMG-CG
    iteration at the measured n=262k per-iteration time."""
    import time

    from lsbench_tpu.matrix.generate import poisson_2d
    from lsbench_tpu.parallel.comm_model import (amg_comm_volume,
                                                 predict_efficiency)
    from lsbench_tpu.parallel.dist_amg import DistributedAmg, \
        DistributedAmgCgIr
    from lsbench_tpu.parallel.mesh import make_row_mesh

    A = poisson_2d(512)          # n=262,144 — the §4 production case
    b = np.arange(A.nrows, dtype=np.float64)
    mesh = make_row_mesh(8)
    rows = []
    sim = []
    for comm in ("auto", "all_gather"):
        s = DistributedAmg(A, mesh, cycles=2, dtype=jnp.float32, comm=comm)
        cv = amg_comm_volume(s)
        rows.append({
            "comm": comm, "n": A.nrows, "devices": 8,
            "levels": [{"level": lv.level, "a": lv.a_strategy,
                        "a_halo": lv.a_halo, "r": lv.r_strategy,
                        "p": lv.p_strategy, "bytes": lv.bytes}
                       for lv in cv.levels],
            "ppermutes_per_cycle": cv.ppermutes_per_cycle,
            "all_gathers_per_cycle": cv.all_gathers_per_cycle,
            "bytes_per_cycle": cv.bytes_per_cycle,
            "bytes_per_iter": cv.bytes_per_iter_payload})
        # Sim-mesh wall time per 2-cycle application (schedule cost on a
        # shared-memory host; validates the cheaper schedule, not ICI).
        fn = s.solve_fn()
        jax.block_until_ready(fn(b))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(b)
        jax.block_until_ready(out)
        per_cycle_ms = (time.perf_counter() - t0) / reps / 2 * 1e3
        sim.append({"comm": comm, "per_cycle_ms": round(per_cycle_ms, 2)})

    # ICI prediction for one AMG-CG-IR iteration at n=262k: measured
    # single-chip 0.80 s / 57 iters = 14.0 ms/iter (RESULTS §4). The
    # halo CV is device-count-dependent only through psum hops, so price
    # it at 2/4/8 devices.
    t1_amg = 0.80 / 57
    ici = []
    for d in (2, 4, 8):
        s = DistributedAmg(A, make_row_mesh(d), cycles=2,
                           dtype=jnp.float32, comm="auto")
        cv = amg_comm_volume(s).as_comm_volume()
        eff, t_d = predict_efficiency(t1_amg, cv)
        ici.append({"devices": d, "t1_ms": round(t1_amg * 1e3, 2),
                    "t_d_ms": round(t_d * 1e3, 3),
                    "pred_efficiency": round(eff, 3),
                    "bytes_per_iter": cv.bytes_per_spmv,
                    "ppermutes_per_iter": cv.ppermutes_per_spmv,
                    "all_gather_hops": cv.gather_hops_per_spmv})
    return rows, sim, ici


def sensitivity_table():
    """Crossover-n sensitivity to the two assumed ICI constants
    (VERDICT r4 weak 3): link bw ±50%, hop latency ×0.5/×2."""
    from lsbench_tpu.parallel.comm_model import efficiency_crossover_n
    rows = []
    for bw in (22.5, 45.0, 90.0):
        for hop in (0.5e-6, 1e-6, 2e-6):
            rows.append({"link_gbps": bw, "hop_latency_us": hop * 1e6,
                         **{f"n80_d{d}": efficiency_crossover_n(
                             5.0, GNNZ_262K, d, link_gbps=bw,
                             hop_latency_s=hop) for d in (2, 4, 8)}})
    return rows


def main():
    sweep = sweep_tables()
    model, n80 = model_tables()
    amg_comm, amg_sim, amg_ici = amg_tables()
    sens = sensitivity_table()
    with open(OUT, "w") as f:
        for r in sweep:
            f.write(json.dumps({"kind": "sim_sweep", **r}) + "\n")
        for r in model:
            f.write(json.dumps({"kind": "ici_model", **r}) + "\n")
        f.write(json.dumps({"kind": "crossover_80pct",
                            "nnz_per_row": 5.0,
                            "gnnz_per_s": GNNZ_262K, **{str(k): v for k, v
                                                        in n80.items()}})
                + "\n")
        for r in amg_comm:
            f.write(json.dumps({"kind": "amg_comm", **r}) + "\n")
        for r in amg_sim:
            f.write(json.dumps({"kind": "amg_sim_cycle", **r}) + "\n")
        for r in amg_ici:
            f.write(json.dumps({"kind": "amg_ici", **r}) + "\n")
        for r in sens:
            f.write(json.dumps({"kind": "ici_sensitivity", **r}) + "\n")

    print("\n### CPU-sim sweep (path validation)\n")
    print("| matrix | mesh | strategy | elapsed s | Gnnz/s | eff(sim) |")
    print("|---|---|---|---|---|---|")
    for r in sweep:
        print(f"| {r['matrix']} | {r['mesh']} | {r['strategy']} "
              f"| {r['elapsed_s']:.4f} | {r['nnz_per_s']/1e9:.3f} "
              f"| {r['efficiency']:.2f} |")

    print("\n### ICI model (measured t1 + v5e link parameters)\n")
    print("| case | D | strategy | halo | B/SpMV | t1 µs | t_D µs "
          "| pred eff |")
    print("|---|---|---|---|---|---|---|---|")
    for r in model:
        print(f"| {r['case']} | {r['devices']} | {r['strategy']} "
              f"| {r['halo']} | {r['bytes_per_spmv']} | {r['t1_us']} "
              f"| {r['t_d_us']} | {r['pred_efficiency']} |")
    print(f"\n80%-efficiency crossover n (banded, 5 nnz/row, "
          f"{GNNZ_262K} Gnnz/s single-chip): "
          + ", ".join(f"D={d}: n≈{v:,}" for d, v in n80.items()))

    print("\n### AMG V-cycle schedule at n=262k, 8 devices "
          "(amg_comm_volume, trace-pinned)\n")
    print("| comm | ppermutes/cycle | all_gathers/cycle | KB/cycle "
          "| sim ms/cycle |")
    print("|---|---|---|---|---|")
    for r, s in zip(amg_comm, amg_sim):
        print(f"| {r['comm']} | {r['ppermutes_per_cycle']} "
              f"| {r['all_gathers_per_cycle']} "
              f"| {r['bytes_per_cycle']/1024:.1f} | {s['per_cycle_ms']} |")
    print("\nper-level strategies (auto):",
          amg_comm[0]["levels"])

    print("\n### ICI model: one AMG-CG-IR iteration at n=262k "
          "(t1 = 14.0 ms measured, §4)\n")
    print("| D | B/iter | ppermutes | gather hops | t_D ms | pred eff |")
    print("|---|---|---|---|---|---|")
    for r in amg_ici:
        print(f"| {r['devices']} | {r['bytes_per_iter']} "
              f"| {r['ppermutes_per_iter']} | {r['all_gather_hops']} "
              f"| {r['t_d_ms']} | {r['pred_efficiency']} |")

    print("\n### Crossover-n sensitivity (CG halo path)\n")
    print("| link GB/s | hop µs | n80 D=2 | D=4 | D=8 |")
    print("|---|---|---|---|---|")
    for r in sens:
        print(f"| {r['link_gbps']} | {r['hop_latency_us']} "
              f"| {r['n80_d2']:,} | {r['n80_d4']:,} | {r['n80_d8']:,} |")


if __name__ == "__main__":
    main()
