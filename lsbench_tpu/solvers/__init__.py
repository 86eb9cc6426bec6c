from lsbench_tpu.solvers.base import (SolveResult, Solver, get_solver,
                                      list_solvers, register_solver)

# Importing solver modules registers them.
from lsbench_tpu.solvers import cg  # noqa: F401

__all__ = ["SolveResult", "Solver", "get_solver", "list_solvers",
           "register_solver"]
