"""Shared small utilities."""

from lsbench_tpu.utils.fence import host_fence  # noqa: F401
