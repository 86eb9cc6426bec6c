from lsbench_tpu.matrix.csr import CsrMatrix
from lsbench_tpu.matrix.ell import EllMatrix
from lsbench_tpu.matrix.io import read_matrix, write_matrix

__all__ = ["CsrMatrix", "EllMatrix", "read_matrix", "write_matrix"]
