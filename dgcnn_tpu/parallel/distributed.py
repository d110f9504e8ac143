"""Multi-host initialisation and cross-host utilities.

The reference has no distributed backend (SURVEY.md §2: no
torch.distributed/NCCL/MPI anywhere — single process). Here multi-host is
first-class: ``initialize()`` wires ``jax.distributed`` (one process per
host; ICI collectives inside a slice, DCN across slices, all scheduled by
XLA from sharding annotations — nothing NCCL-like to manage by hand).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialise multi-host JAX (no-op on a single process).

    Args default to the standard env vars (JAX_COORDINATOR_ADDRESS etc. /
    cloud TPU metadata) via ``jax.distributed.initialize``'s autodetection.
    Returns a summary {'process_index', 'process_count', 'local_devices',
    'global_devices'}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_batch_parts(global_batch: int) -> tuple[int, int]:
    """Split a global batch across processes: (per-process batch, offset)."""
    pc, pi = jax.process_count(), jax.process_index()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    per = global_batch // pc
    return per, pi * per


def all_processes_agree(value: float) -> bool:
    """Cross-host consistency check (e.g. on metrics before checkpointing):
    true iff every process passes the same value. Single-process: trivially
    true. Multi-process: gathers every process's value with
    ``multihost_utils.process_allgather`` (the maintained API for exactly
    this) and compares."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    vals = np.asarray(
        multihost_utils.process_allgather(np.float32(value))
    )
    return bool(np.all(vals == vals.flat[0]))
