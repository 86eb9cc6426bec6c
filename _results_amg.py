"""Regenerate the AMG convergence-factor table in RESULTS.md (CPU)."""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.solvers.base import get_solver

MATS = ["tj7a_A_12","tj7a_A_15","tj7a_A_18","xn3b_A_10","xn3b_A_12","xn3b_A_15","xn3b_A_18"]
CONFIGS = [
    ("r2 hypre preset", dict(coarsening="classical", theta=0.5, interp="jacobi", degree=3, pre_sweeps=2, post_sweeps=2)),
    ("ext+i (hypre interp 6)", dict(coarsening="classical", theta=0.5, interp="ext+i", degree=3, pre_sweeps=2, post_sweeps=2)),
    ("abs strength (negative result)", dict(coarsening="classical", theta=0.5, interp="jacobi", strength="abs", degree=3, pre_sweeps=2, post_sweeps=2)),
    ("r3 hypre preset (damped ideal-interp)", dict(coarsening="classical", theta=0.5, interp="jacobi", interp_passes=3, interp_omega=0.5, pmax=8, degree=3, pre_sweeps=2, post_sweeps=2)),
    ("l1-hybrid-SGS (hypre relax 8)", dict(coarsening="classical", theta=0.5, interp="jacobi", smoother="l1_gs", degree=2, pre_sweeps=2, post_sweeps=2)),
    ("pairwise K-cycle (paralmond)", dict(coarsening="sa_pairwise", cycle="k", degree=3, pre_sweeps=2, post_sweeps=2)),
]
print("| matrix | " + " | ".join(n for n,_ in CONFIGS) + " |")
print("|---" * (len(CONFIGS)+1) + "|")
for mat in MATS:
    A = read_matrix(f"/root/reference/tests/{mat}.txt")
    b = np.arange(A.nrows, dtype=np.float64)
    row = [mat]
    for _, kw in CONFIGS:
        cls, _ = get_solver("amg")
        kw = dict(kw); kw.setdefault("smoother", "chebyshev")
        s = cls(A, rtol=1e-10, maxiter=30, **kw)
        res = s.solve(b)
        fac = res.relres ** (1.0/max(res.iters,1))
        row.append(f"{fac:.3f}")
    print("| " + " | ".join(row) + " |")
