"""Test config: CPU backend with 8 virtual devices (default lane), or the
real TPU (hardware lane).

Default: distributed code paths are tested on a simulated mesh
(`--xla_force_host_platform_device_count=8`) exactly as they run on real
ICI — same shard_map code, same collectives (SURVEY.md §4 item 3).
Must run before the first jax import.

Hardware lane (VERDICT r1 item 2 — catches interpret/hardware divergence
like the onehot variant, ops/spmv_pallas.py):

    LSBENCH_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

keeps the TPU backend and runs only the @pytest.mark.tpu tests
(tests/test_tpu_hw.py). Without the env var, tpu-marked tests auto-skip.
"""

import os

import pytest

TPU_LANE = os.environ.get("LSBENCH_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
# TPU tunnel; the env var alone is read too early to help, so override the
# live config as well (backend init is lazy, so this still wins).
import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware; run via LSBENCH_TPU_TESTS=1 "
        "pytest -m tpu")


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip = pytest.mark.skip(
        reason="TPU hardware lane off (LSBENCH_TPU_TESTS=1, -m tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

from pathlib import Path

import numpy as np
import pytest

REFERENCE_TESTS = Path("/root/reference/tests")


@pytest.fixture
def ref_data_dir():
    if not REFERENCE_TESTS.is_dir():
        pytest.skip("reference test matrices not available")
    return REFERENCE_TESTS


@pytest.fixture
def tiny_matrix_file(tmp_path):
    """I1_05x05-equivalent: diag(1..5), base 1 (tests/I1_05x05.txt)."""
    p = tmp_path / "diag5.txt"
    lines = ["5 1"] + [f"{i} {i} {float(i)}" for i in range(1, 6)]
    p.write_text("\n".join(lines) + "\n")
    return p


@pytest.fixture
def base_pair_files(tmp_path):
    """The same 2x2 matrix in base-0 and base-1 form (tests/A0_02x02.txt vs
    tests/A1_02x02.txt fixture role)."""
    a0 = tmp_path / "a0.txt"
    a0.write_text("4 0\n0 0 1\n0 1 1\n1 0 1\n1 1 -1\n")
    a1 = tmp_path / "a1.txt"
    a1.write_text("4 1\n1 1 1\n1 2 1\n2 1 1\n2 2 -1\n")
    return a0, a1


def make_rhs(n):
    """Reference RHS convention r[i]=i (lsbench.c:158-160)."""
    return np.arange(n, dtype=np.float64)
