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


def put_replicated(tree, sharding):
    """Replicate a host pytree onto a (possibly multi-process) mesh.

    ``jax.device_put`` cannot target shardings with non-addressable
    devices; this goes leaf-by-leaf through
    ``jax.make_array_from_process_local_data`` (every process passes the
    SAME full value — deterministic init/seeds make that hold), unwrapping
    typed PRNG keys around the raw-buffer API.
    """
    def put(x):
        try:
            is_key = jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
        except Exception:  # noqa: BLE001 — non-array leaf
            is_key = False
        raw = np.asarray(jax.random.key_data(x) if is_key else x)
        g = jax.make_array_from_process_local_data(sharding, raw, raw.shape)
        return jax.random.wrap_key_data(g) if is_key else g

    return jax.tree_util.tree_map(put, tree)


def make_global_batch(arrays, sharding, *, replicate: bool):
    """Build global batch arrays from each process's copy of the FULL
    (deterministically generated) global batch.

    ``replicate=False``: the leading axis shards over ``sharding`` and
    each process donates only its own row block (the batch must divide
    by process count — the caller's divisibility-by-device-count check
    implies it). ``replicate=True`` (validation tail batches): every
    process passes the full array under the replicated ``sharding``.
    Single-process callers can use plain ``jax.device_put`` instead.
    """
    if replicate:
        return tuple(
            jax.make_array_from_process_local_data(sharding, np.asarray(a),
                                                   np.shape(a))
            for a in arrays
        )
    per, off = global_batch_parts(len(arrays[0]))
    return tuple(
        jax.make_array_from_process_local_data(
            sharding, np.asarray(a)[off:off + per], np.shape(a))
        for a in arrays
    )


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
