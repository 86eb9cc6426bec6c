"""Host-symbolic + device-numeric SpGEMM / RAP (ops/spgemm_device.py,
SURVEY.md §7.5)."""

import jax.numpy as jnp
import numpy as np

from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.generate import poisson_2d
from lsbench_tpu.ops.spgemm import rap, spgemm
from lsbench_tpu.ops.spgemm_device import (rap_device, rap_numeric,
                                           rap_symbolic, spgemm_numeric,
                                           spgemm_symbolic)


def _rand_sparse(rng, m, n, density=0.2):
    a = rng.random((m, n))
    a[a < 1 - density] = 0
    a[0, 0] = 1.0
    return CsrMatrix.from_dense(a)


def test_spgemm_numeric_matches_host():
    rng = np.random.default_rng(0)
    A = _rand_sparse(rng, 30, 40)
    B = _rand_sparse(rng, 40, 25)
    plan = spgemm_symbolic(A, B)
    vals = np.asarray(spgemm_numeric(plan, jnp.asarray(A.vals),
                                     jnp.asarray(B.vals)))
    C_dev = CsrMatrix(nrows=plan.nrows, ncols=plan.ncols, offs=plan.offs,
                      cols=plan.cols, vals=np.asarray(vals, np.float64))
    C_host = spgemm(A, B)
    np.testing.assert_allclose(C_dev.to_dense(), C_host.to_dense(),
                               atol=1e-12)


def test_rap_device_matches_host():
    rng = np.random.default_rng(1)
    A = poisson_2d(10)
    P = _rand_sparse(rng, A.nrows, 25, density=0.1)
    R = P.transpose()
    np.testing.assert_allclose(rap_device(R, A, P).to_dense(),
                               rap(R, A, P).to_dense(), atol=1e-12)


def test_rap_numeric_revalue_same_pattern():
    # The point of the split: re-form coarse values for NEW operator
    # values without re-running the symbolic pass.
    rng = np.random.default_rng(2)
    A = poisson_2d(8)
    P = _rand_sparse(rng, A.nrows, 12, density=0.15)
    R = P.transpose()
    plan = rap_symbolic(R, A, P)
    A2 = CsrMatrix(nrows=A.nrows, ncols=A.ncols, offs=A.offs, cols=A.cols,
                   vals=A.vals * 3.5)
    v2 = np.asarray(rap_numeric(plan, jnp.asarray(R.vals),
                                jnp.asarray(A2.vals), jnp.asarray(P.vals)))
    ref = rap(R, A2, P)
    C2 = CsrMatrix(nrows=plan.rap.nrows, ncols=plan.rap.ncols,
                   offs=plan.rap.offs, cols=plan.rap.cols,
                   vals=np.asarray(v2, np.float64))
    np.testing.assert_allclose(C2.to_dense(), ref.to_dense(), atol=1e-12)
