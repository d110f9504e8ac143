"""Tensor parallelism: channel-sharded trunk weights.

SURVEY.md §2 parallelism table lists TP as optional for this model ("shard
emb_dims/channel axes of conv6-conv8 across the mesh; not needed at 0.98M
params"). It becomes useful at large ``emb_dims`` (the conv6/conv7 pair is
O(emb·(192 + 512)) parameters and activations of O(B·N·emb)): sharding the
emb axis splits the largest activation tensor and its two matmuls across
the mesh.

Implementation is annotation-only — no shard_map: weights get
``NamedSharding`` placements and ``jit`` propagates them, inserting the
one collective the math needs (a psum over the contracted emb axis inside
conv7, Megatron column→row parallel style):

* conv6 w (192, emb): shard axis 1 ("column parallel") → emb activations
  (B, N, emb) sharded on the channel axis; bn6 γ/β/stats shard likewise;
  the global max-pool is per-channel and stays local;
* conv7 w (emb+192, 512): rows [0:emb] shard axis 0 ("row parallel" —
  contraction over the sharded emb inserts the psum); output (B, N, 512)
  replicated again.

conv8/conv9 stay replicated (tiny). Per-device parameter bytes for the
trunk drop by ~n_shards; outputs are bitwise-equal to the replicated run
up to f32 reassociation in the psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_shardings(mesh: Mesh, axis: str = "points") -> dict:
    """PartitionSpec tree for TP placement over mesh axis ``axis``
    (reusing the 'points' axis: TP and point-sharding are alternative uses
    of the same ICI dimension, never active together in one forward)."""
    col = P(None, axis)   # shard output channels
    row = P(axis, None)   # shard input (contracted) channels
    vec = P(axis)         # per-emb-channel vectors
    specs = {
        "conv6": {"w": col},
        "bn6": {"gamma": vec, "beta": vec},
        "conv7": {"w": row},
    }
    return specs


def shard_params_tp(params, state, mesh: Mesh, axis: str = "points"):
    """Place a replicated (params, bn_state) pytree with conv6/bn6/conv7
    sharded over ``axis``; everything else replicated. Returns new trees.

    conv7's weight rows [0:emb] contract against the sharded emb axis; its
    trailing 192 rows (the skip-connection channels, /root/reference/
    model.py:175-180) are replicated — jax shards the whole (emb+192, 512)
    array on axis 0, which keeps the split consistent as long as
    emb % n_shards == 0 and 192 % n_shards == 0.
    """
    emb = params["conv6"]["w"].shape[1]
    n = mesh.shape[axis]
    if emb % n or 192 % n:
        raise ValueError(f"emb={emb} and 192 must divide TP width {n}")
    specs = tp_param_shardings(mesh, axis)
    repl = NamedSharding(mesh, P())

    def place(tree, spec_tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = place(v, spec_tree.get(k, {}))
            else:
                spec = spec_tree.get(k)
                sh = NamedSharding(mesh, spec) if spec is not None else repl
                out[k] = jax.device_put(v, sh)
        return out

    new_params = place(params, specs)
    new_state = place(
        state, {"bn6": {"mean": P(axis), "var": P(axis)}}
    )
    return new_params, new_state


def tp_shard_info(params) -> dict:
    """Diagnostic: bytes of the largest addressable shard per leaf name —
    evidence the trunk really is split."""
    info = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            info[name] = max(int(np.prod(s.data.shape)) * leaf.dtype.itemsize
                             for s in shards)
    return info
