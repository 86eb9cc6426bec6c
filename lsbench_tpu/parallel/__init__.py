from lsbench_tpu.parallel.mesh import make_row_mesh
from lsbench_tpu.parallel.dist_cg import DistributedCg

__all__ = ["make_row_mesh", "DistributedCg"]
