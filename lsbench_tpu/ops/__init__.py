from lsbench_tpu.ops.spmv import spmv_ell

__all__ = ["spmv_ell"]
