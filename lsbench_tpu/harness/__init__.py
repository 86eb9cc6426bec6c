from lsbench_tpu.harness.bench import BenchRecord, run_bench

__all__ = ["BenchRecord", "run_bench"]
