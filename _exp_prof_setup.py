import time, numpy as np, jax, jax.numpy as jnp
import lsbench_tpu.solvers.cg as cgmod
import lsbench_tpu.solvers.amg as amgmod
from lsbench_tpu.matrix.generate import poisson_2d

orig_bm = cgmod.build_matvec
def timed_bm(A, dtype, layout):
    t0 = time.perf_counter()
    out = orig_bm(A, dtype, layout)
    jax.block_until_ready(jax.tree_util.tree_leaves(out[1])[0])
    print(f"  build_matvec {layout} {A.nrows}x{A.ncols} nnz={A.nnz}: {time.perf_counter()-t0:.2f}s", flush=True)
    return out
cgmod.build_matvec = timed_bm
amgmod.build_matvec = timed_bm

orig_hier = amgmod.build_matrix_hierarchy
def timed_hier(A, opts, breakdown=None):
    t0 = time.perf_counter()
    out = orig_hier(A, opts, breakdown=breakdown)
    print(f"  build_matrix_hierarchy: {time.perf_counter()-t0:.2f}s (cache={None if breakdown is None else breakdown.get('hier_cache')})", flush=True)
    return out
amgmod.build_matrix_hierarchy = timed_hier

orig_rho = amgmod.estimate_rho_dinv_a
def timed_rho(Al, dinv):
    t0 = time.perf_counter()
    out = orig_rho(Al, dinv)
    print(f"  rho n={Al.nrows}: {time.perf_counter()-t0:.2f}s", flush=True)
    return out
amgmod.estimate_rho_dinv_a = timed_rho

from lsbench_tpu.solvers.base import get_solver
A = poisson_2d(512)
cls, ps = get_solver("cg_ir")
ps.update(rtol=1e-10, precond="amg", precond_params=dict(coarsening="classical", theta=0.25))
t0 = time.perf_counter()
s = cls(A, **ps)
print("total setup", round(time.perf_counter()-t0, 2), flush=True)
print("breakdown", {k: round(v,2) if isinstance(v,float) else v for k,v in s.setup_breakdown.items()})

# solve timing (3 reps, host-transfer fenced)
fn, args = s.solve_fn_args()
bj = jnp.asarray(np.arange(A.nrows, dtype=np.float64))
jitted = jax.jit(fn)
t0 = time.perf_counter(); np.asarray(jitted(args, bj)); print("first call", round(time.perf_counter()-t0,1), flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(jitted(args, bj)); ts.append(time.perf_counter()-t0)
print("solve_s median", round(float(np.median(ts)), 4))
res = s.solve(np.arange(A.nrows, dtype=np.float64))
print("iters", res.iters, "relres", res.relres, "converged", res.converged)
