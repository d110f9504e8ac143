"""Point-axis-sharded DGCNN inference (sequence parallelism).

The reference caps blocks at N=7000 because its O(N²) kNN and the dense
feature tensors must fit one device (SURVEY.md §5 "long-context"). This
module runs the *entire eval forward* with the point axis sharded over the
mesh's 'points' axis:

* kNN: ring candidate rotation (parallel/ring_knn.py) — exact global
  neighbours, O(N_local²) peak memory;
* neighbour gather: the same ring — each hop gathers locally from the
  visiting shard for the indices that live on it and mask-accumulates;
* global max-pool: local max + ``lax.pmax`` over the points axis;
* everything else (1×1 convs, eval BatchNorm, LeakyReLU) is per-point and
  needs no communication.

Eval only: training BatchNorm batch statistics would additionally need
cross-shard psums (planned; the data-parallel path covers training).
Outputs are bit-identical to the unsharded eval forward up to kNN tie
order across shard boundaries (tests compare exactly on tie-free data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dgcnn_tpu.models.dgcnn import (
    DGCNNConfig,
    _batch_norm,
    _lrelu,
    _mm,
)
from dgcnn_tpu.ops.edgeconv import gather_neighbors
from dgcnn_tpu.parallel.ring_knn import ring_knn_local

AXIS = "points"


def _ring_gather(feats_local: jax.Array, gidx: jax.Array) -> jax.Array:
    """Gather per-neighbour features for *global* indices under sharding.

    feats_local: (B, Nl, C) this shard's features.
    gidx: (B, Nl, k) global point indices (any shard).
    Returns (B, Nl, k, C).
    """
    d = jax.lax.axis_size(AXIS)
    me = jax.lax.axis_index(AXIS)
    b, nl, c = feats_local.shape
    k = gidx.shape[-1]
    acc = jnp.zeros((b, nl, k, c), feats_local.dtype)
    cand = feats_local
    perm = [(j, (j + 1) % d) for j in range(d)]
    for step in range(d):
        shard_id = (me - step) % d
        local = gidx - shard_id * nl
        hit = (local >= 0) & (local < nl)
        safe = jnp.clip(local, 0, nl - 1)
        g = gather_neighbors(cand, safe)
        acc = jnp.where(hit[..., None], g, acc)
        if step + 1 < d:
            cand = jax.lax.ppermute(cand, AXIS, perm)
    return acc


def _edge_stage_sharded(x, params, state, names, cfg):
    """Two-conv EdgeConv stage under point sharding (eval BN)."""
    conv_a, bn_a, conv_b, bn_b = names
    w = params[conv_a]["w"]
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx = ring_knn_local(x, cfg.k, AXIS)
    a = _mm(x, w_d, cfg._cdtype)
    bvec = _mm(x, w_x - w_d, cfg._cdtype)
    e = _ring_gather(a, idx) + bvec[:, :, None, :]
    e, _ = _batch_norm(e, params[bn_a], state[bn_a], train=False)
    e = _lrelu(e)
    e = _mm(e, params[conv_b]["w"], cfg._cdtype)
    e, _ = _batch_norm(e, params[bn_b], state[bn_b], train=False)
    return jnp.max(_lrelu(e), axis=2)


def _edge_stage3_sharded(x, params, state, cfg):
    """Single-conv stage with the max-through-BN fold (eval)."""
    w = params["conv5"]["w"]
    c = x.shape[-1]
    w_d, w_x = w[:c], w[c:]
    idx = ring_knn_local(x, cfg.k, AXIS)
    a = _mm(x, w_d, cfg._cdtype)
    bvec = _mm(x, w_x - w_d, cfg._cdtype)
    nbr = _ring_gather(a, idx)
    mx = jnp.max(nbr, axis=2) + bvec
    mn = jnp.min(nbr, axis=2) + bvec
    sel = jnp.where(params["bn5"]["gamma"] >= 0, mx, mn)
    y, _ = _batch_norm(sel, params["bn5"], state["bn5"], train=False)
    return _lrelu(y)


def _forward_local(params, state, x, cfg: DGCNNConfig):
    """shard_map body: x (B, N_local, F) -> logits (B, N_local, C)."""
    x1 = _edge_stage_sharded(
        x, params, state, ("conv1", "bn1", "conv2", "bn2"), cfg
    )
    x2 = _edge_stage_sharded(
        x1, params, state, ("conv3", "bn3", "conv4", "bn4"), cfg
    )
    x3 = _edge_stage3_sharded(x2, params, state, cfg)

    locals_ = jnp.concatenate([x1, x2, x3], axis=-1)
    emb = _mm(locals_, params["conv6"]["w"], cfg._cdtype)
    emb, _ = _batch_norm(emb, params["bn6"], state["bn6"], train=False)
    emb = _lrelu(emb)
    glob = jnp.max(emb, axis=1)                     # (B, emb) local
    glob = jax.lax.pmax(glob, AXIS)                 # global over all points

    n_local = x.shape[1]
    g = jnp.broadcast_to(
        glob[:, None, :], (x.shape[0], n_local, cfg.emb_dims)
    )
    h = jnp.concatenate([g, x1, x2, x3], axis=-1)
    h = _mm(h, params["conv7"]["w"], cfg._cdtype)
    h, _ = _batch_norm(h, params["bn7"], state["bn7"], train=False)
    h = _lrelu(h)
    h = _mm(h, params["conv8"]["w"], cfg._cdtype)
    h, _ = _batch_norm(h, params["bn8"], state["bn8"], train=False)
    h = _lrelu(h)
    return _mm(h, params["conv9"]["w"], cfg._cdtype)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def apply_dgcnn_sharded(
    params,
    state,
    x: jax.Array,
    cfg: DGCNNConfig,
    mesh: Mesh,
) -> jax.Array:
    """Eval forward with points sharded over mesh axis 'points' (batch over
    'data'). x: (B, N, F); N divisible by the points axis; B by the data
    axis. Returns (B, N, C) logits."""
    n = x.shape[1]
    n_sp = mesh.shape[AXIS]
    if n % n_sp:
        raise ValueError(f"N={n} not divisible by points axis {n_sp}")
    body = functools.partial(_forward_local, cfg=cfg)
    spec_x = P("data", AXIS, None)
    repl = P()
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, spec_x),
        out_specs=spec_x,
    )(params, state, x)
    return out
