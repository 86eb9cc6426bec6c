from lsbench_tpu.solvers.base import (SolveResult, Solver, get_solver,
                                      list_solvers, register_solver)

# Importing solver modules registers them.
from lsbench_tpu.solvers import cg  # noqa: F401
from lsbench_tpu.solvers import bicgstab  # noqa: F401
from lsbench_tpu.solvers import refine  # noqa: F401
from lsbench_tpu.solvers import direct  # noqa: F401
from lsbench_tpu.solvers import sparse_cholesky  # noqa: F401
from lsbench_tpu.solvers import amg  # noqa: F401
from lsbench_tpu.solvers import gmres  # noqa: F401
from lsbench_tpu.solvers.base import register_alias

# Reference backend names → native solvers with matching protocols
# (lsbench.h:8-16 solver enum; per-backend protocols in BASELINE.md).
# Ginkgo: BiCGSTAB + Jacobi, implicit resnorm ≤ 1e-4 × initial
# (ginkgo.cpp:55-64).
register_alias("ginkgo", "bicgstab", precond="jacobi", rtol=1e-4)
# CHOLMOD: ordering+factorization in setup, timed solve = triangular solves
# (cholmod-impl.h:25-26,44-63).
register_alias("cholmod", "cholesky", refactor_each_solve=False)
# cusolver csrlsvchol: full factor+solve per timed trial (cusparse.c:183-194).
register_alias("cusolver", "cholesky", refactor_each_solve=True)
# Hypre BoomerAMG: classical AMG (PMIS coarsening, distance-2 interpolation
# via Jacobi-improved direct interp — the ext+i role, hypre.c:127-128 —
# strength 0.25), fixed 2 V-cycles, 1 sweep up/down, Chebyshev-family
# smoother (hypre.c:126-188).
register_alias("hypre", "amg", cycles=2, coarsening="classical", theta=0.25,
               interp="jacobi")
# AmgX: CLASSICAL selector, D2 interpolator, strength 0.25, 1 V-cycle
# (amgx.c:78-86).
register_alias("amgx", "amg", cycles=1, coarsening="classical", theta=0.25,
               interp="jacobi")
# parAlmond: single AMG K-cycle application (paralmond.cpp:118-140; the
# parAlmond library is K-cycle AMG).
register_alias("paralmond", "amg", cycles=1, cycle="k")

__all__ = ["SolveResult", "Solver", "get_solver", "list_solvers",
           "register_solver"]
