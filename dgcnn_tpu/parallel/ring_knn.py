"""Ring kNN: point-axis-sharded neighbour search over the device mesh.

The reference scales point count purely by host-side spatial tiling
(SURVEY.md §5 "long-context"); blocks are capped at N=7000 because the
O(N²) kNN must fit one device. This primitive removes that cap: the point
axis is sharded over the mesh's 'points' axis and candidate shards rotate
around the ring (``lax.ppermute`` → ICI neighbour hops, ring-attention
style). Each device keeps a running k-best merged with ``lax.top_k`` per
hop, so peak memory is O(N_local² ) and every hop's distance matmul
overlaps the next shard's transfer under XLA's scheduler.

Whole-tile inference at N = D x 7000 becomes one jitted program instead of
D sequential host-tiled forwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_knn_local(
    x_local: jax.Array, k: int, axis_name: str = "points"
) -> jax.Array:
    """Per-shard body: global kNN indices for this device's query points.

    Must run inside ``shard_map`` with ``axis_name`` mapped. ``x_local`` is
    (B, N_local, C); returns (B, N_local, k) *global* point indices.
    """
    d = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    n_local = x_local.shape[1]
    q = x_local.astype(jnp.float32)

    best_s = None
    best_i = None
    cand = q
    perm = [(j, (j + 1) % d) for j in range(d)]
    for step in range(d):
        # after `step` forward rotations we hold the shard that started on
        # device (me - step) mod d
        shard_id = (me - step) % d
        offset = shard_id * n_local
        cnorm = jnp.sum(cand * cand, axis=-1)                  # (B, Nl)
        scores = 2.0 * jnp.einsum(
            "bqc,bnc->bqn", q, cand, preferred_element_type=jnp.float32
        ) - cnorm[:, None, :]
        kk = min(k, n_local)
        s, idx = jax.lax.top_k(scores, kk)                     # local idx
        gi = idx.astype(jnp.int32) + offset
        if best_s is None:
            best_s, best_i = s, gi
        else:
            all_s = jnp.concatenate([best_s, s], axis=-1)
            all_i = jnp.concatenate([best_i, gi], axis=-1)
            best_s, pos = jax.lax.top_k(all_s, k)
            best_i = jnp.take_along_axis(all_i, pos, axis=-1)
        if best_s.shape[-1] < k:  # first hops with n_local < k
            pad = k - best_s.shape[-1]
            best_s = jnp.pad(best_s, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-jnp.inf)
            best_i = jnp.pad(best_i, ((0, 0), (0, 0), (0, pad)))
        if step + 1 < d:
            cand = jax.lax.ppermute(cand, axis_name, perm)
    return best_i


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def knn_sharded(x: jax.Array, k: int, mesh: Mesh) -> jax.Array:
    """Global exact kNN with the point axis sharded over mesh axis 'points'
    (batch over 'data'). x: (B, N, C), N divisible by the points-axis size.

    Returns (B, N, k) int32 global indices (neighbour sets identical to
    single-device knn; within-set order may differ where distances tie
    across shard boundaries).
    """
    n = x.shape[1]
    n_shards = mesh.shape["points"]
    if n % n_shards:
        raise ValueError(f"N={n} not divisible by points axis {n_shards}")
    body = functools.partial(ring_knn_local, k=k, axis_name="points")
    spec = P("data", "points", None)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec,), out_specs=spec,
    )(x)
    return out
