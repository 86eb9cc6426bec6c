"""lsbench_tpu — a TPU-native sparse linear-solver library + benchmark harness.

Re-creates the capabilities of the reference ``lsbench`` (a C/C++ harness
wrapping cuSolverSp, CHOLMOD, Hypre BoomerAMG, AmgX, parAlmond and Ginkgo —
see /root/reference/src/lsbench.h:36-40) as native JAX/XLA/Pallas solvers:

- matrix core: COO text reader with reference-identical semantics
  (lsbench-csr.c:29-92), host CSR, TPU-friendly padded (ELL) and
  block-sparse device layouts
- kernels: jnp + Pallas SpMV, fused Krylov reductions
- solvers: CG / BiCGSTAB / GMRES (Krylov), dense+banded Cholesky (direct),
  algebraic multigrid (AMG) as preconditioner and fixed-cycle solver
- distribution: block-row partitioning over a `jax.sharding.Mesh`,
  halo exchange + fused all-reduces (replaces the reference's vestigial
  MPI path, paralmond.cpp:94-102)
- harness: the reference CLI (lsbench.c:84-92) and CSV schema
  (cusparse.c:207-209) plus extended JSON reporting.

FP64 semantics are preserved by enabling x64 at import (the reference
enforces FP64, lsbench.c:140-141); FP32 and mixed-precision iterative
refinement are offered as TPU-fast alternatives.
"""

import os as _os

import jax as _jax

# FP64 is the reference's enforced precision (lsbench.c:140-141). TPU f64 is
# emulated but correct; enable before any array is created.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: dense Cholesky and the Pallas kernels
# compile in seconds-to-minutes on TPU; without this every CLI invocation
# (a fresh process) pays it again. Opt out with LSBENCH_NO_COMPILE_CACHE=1.
if not _os.environ.get("LSBENCH_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "LSBENCH_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "lsbench_tpu_xla"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort; never block startup on it

from lsbench_tpu.matrix.csr import CsrMatrix  # noqa: E402
from lsbench_tpu.matrix.io import read_matrix  # noqa: E402
from lsbench_tpu.matrix.ell import EllMatrix  # noqa: E402
from lsbench_tpu.solvers.base import SolveResult, get_solver, list_solvers  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "CsrMatrix",
    "EllMatrix",
    "read_matrix",
    "SolveResult",
    "get_solver",
    "list_solvers",
]
