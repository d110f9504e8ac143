"""Device mesh construction and canonical shardings.

All distribution in dgcnn_tpu is expressed through a `jax.sharding.Mesh`
with up to two axes:

* ``data``   — batch-parallel axis (independent fixed-shape tiles; the
               natural fit for this workload, SURVEY.md §2 parallelism table);
* ``points`` — optional point-axis sharding for whole-tile inference with
               N too large for one chip (ring kNN, parallel/ring_knn.py).

Collectives ride ICI inside a slice; XLA schedules them from the sharding
annotations — there is no hand-written NCCL/MPI analogue to port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_points: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data[, points]) mesh over the available devices.

    Args:
        n_data: size of the data axis; defaults to n_devices / n_points.
        n_points: size of the point-sharding axis (1 = no point sharding).
        devices: explicit device list (defaults to ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_points
    need = n_data * n_points
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_points} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_points)
    return Mesh(grid, ("data", "points"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis over 'data' (points axis unsharded here;
    point-sharded paths use shard_map explicitly)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Model parameters / optimizer state: replicated."""
    return NamedSharding(mesh, P())
