"""Training-backward breakdown on the TPU (round-2 optimization target).

Measured landscape (v5e, B=8, N=7000, k=30, approx kNN):
  train-mode forward ~63 ms | fwd+bwd ~150 ms | full step ~190 ms
  gather fwd+bwd in isolation ~30 ms (scatter-add ~24 ms) x3 gathers
Scatter-add is row-latency bound: bf16 payloads and sort+segment variants
measured no faster (see DESIGN.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.edgeconv import gather_neighbors
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy
from dgcnn_tpu.utils.profiling import measure


def main():
    B, N, K = 8, 7000, 30
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="approx")
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (B, N, 4))
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))

    def loss_fn(p, s, x):
        logits, _ = apply_dgcnn(p, s, x, cfg, train=True,
                                rng=jax.random.key(3))
        return masked_smoothed_cross_entropy(logits, labels, mask)

    fwd = jax.jit(loss_fn)
    s = measure(fwd, params, state, x, iters=5)
    print(f"train-mode forward: {s['sec_per_call']*1e3:.1f} ms")

    grad = jax.jit(lambda p, s_, x: jax.tree_util.tree_leaves(
        jax.grad(loss_fn)(p, s_, x))[0])
    s = measure(grad, params, state, x, iters=5)
    print(f"forward+backward: {s['sec_per_call']*1e3:.1f} ms")

    tab = jax.random.normal(jax.random.key(5), (B, N, 64))
    idx = jax.random.randint(jax.random.key(6), (B, N, K), 0, N)
    gb = jax.jit(jax.grad(lambda t: jnp.sum(gather_neighbors(t, idx) ** 2)))
    s = measure(gb, tab, iters=5)
    print(f"isolated gather fwd+bwd (scatter-add): "
          f"{s['sec_per_call']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
