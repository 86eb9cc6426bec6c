"""Preconditioners for the Krylov solvers.

The reference gets these from vendored libraries (Ginkgo's Jacobi,
ginkgo.cpp:57; Hypre/AmgX/parAlmond AMG). Natively: point Jacobi here;
the AMG V-cycle preconditioner lives in solvers/amg.py.

A preconditioner is `(state, apply)` where `apply(state, r) -> z` is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix


def identity_precond(A: CsrMatrix, dtype):
    del A
    return None, lambda state, r: r


def jacobi_precond(A: CsrMatrix, dtype):
    """z = D^{-1} r. Safe for zero diagonals (falls back to identity rows)."""
    d = A.diagonal()
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 1.0)
    inv_dev = jnp.asarray(inv, dtype=dtype)
    return inv_dev, lambda inv_dev, r: inv_dev * r


def _amg_precond(A: CsrMatrix, dtype):
    from lsbench_tpu.solvers.amg import amg_precond
    return amg_precond(A, dtype)


PRECONDITIONERS = {
    "none": identity_precond,
    "jacobi": jacobi_precond,
    "amg": _amg_precond,
}


def get_preconditioner(name: str):
    try:
        return PRECONDITIONERS[name.lower()]
    except KeyError:
        raise KeyError(
            f"unknown preconditioner '{name}'. Available: {sorted(PRECONDITIONERS)}")
