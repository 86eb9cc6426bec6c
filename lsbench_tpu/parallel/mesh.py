"""Device-mesh construction.

The reference has no working distributed path (its MPI is split into
self-communicators, paralmond.cpp:94-102, and every backend pins one GPU —
SURVEY.md §2.2). The TPU-native replacement: a 1-D `jax.sharding.Mesh` over
the "rows" axis; matrices are block-row partitioned and vectors row-sharded,
with XLA collectives over ICI standing in for MPI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"
COLS = "cols"


def make_mesh_2d(pr: int, pc: int, devices=None) -> Mesh:
    """2-D (rows × cols) mesh for block-partitioned SpMV (parallel/dist2d.py)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < pr * pc:
        raise ValueError(f"requested {pr}x{pc} devices, have {len(devices)}")
    return jax.make_mesh((pr, pc), (ROWS, COLS), devices=devices[: pr * pc])


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested {n_devices} devices, have {len(devices)}")
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (ROWS,), devices=devices)


def row_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (row) dimension; replicate the rest."""
    return NamedSharding(mesh, P(ROWS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
