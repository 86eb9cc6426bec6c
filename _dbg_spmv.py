import time, numpy as np, jax, jax.numpy as jnp
from lsbench_tpu.matrix.io import read_matrix
from lsbench_tpu.matrix.bsr import BsrMatrix
from lsbench_tpu.ordering.rcm import rcm_ordering
from lsbench_tpu.ops.spmv_pallas import spmv_bsr

A0 = read_matrix("/root/reference/tests/xn3b_A_10.txt")
A = A0.permuted(rcm_ordering(A0))
bsr = BsrMatrix.from_csr(A)
x0 = jnp.asarray(np.random.default_rng(0).random(A.nrows), dtype=jnp.float32)

def chain_wall(chain):
    @jax.jit
    def chained(a, x):
        def body(_, v):
            y = spmv_bsr(a, v)
            return y / jnp.max(jnp.abs(y))
        return jax.lax.fori_loop(0, chain, body, x)
    y = chained(bsr, x0); jax.block_until_ready(y)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(bsr, x0))
        ts.append(time.perf_counter() - t0)
    print(f"chain={chain}: walls={[f'{t*1e3:.2f}ms' for t in ts]}  y[0]={float(y[0]):.6f}")
    return sorted(ts)[2]

w1 = chain_wall(200)
w2 = chain_wall(1200)
print("slope us:", (w2 - w1) / 1000 * 1e6)
