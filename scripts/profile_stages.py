"""Per-piece TPU timing of the non-kNN forward components."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dgcnn_tpu.utils.profiling import measure, roundtrip_seconds


def main():
    B, N, K = 8, 7000, 30
    rt = roundtrip_seconds()
    print(f"rt {rt*1e3:.1f} ms")

    from dgcnn_tpu.kernels.knn_pallas import knn_pallas
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
    from dgcnn_tpu.ops.edgeconv import edge_conv_linear, gather_neighbors

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="pallas")
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x4 = jax.random.normal(jax.random.key(1), (B, N, 4))
    x64 = jax.random.normal(jax.random.key(2), (B, N, 64))
    idx = knn_pallas(x64, K)
    jax.block_until_ready(idx)

    pieces = {
        "gather (B,N,k,64)": jax.jit(
            lambda a, i: jnp.sum(gather_neighbors(a, i))
        ),
        "edge_conv_linear 128->64": jax.jit(
            lambda a, i: jnp.sum(
                edge_conv_linear(a, i, params["conv3"]["w"])
            )
        ),
    }
    for name, fn in pieces.items():
        s = measure(fn, x64, idx, iters=5)
        print(f"{name}: {s['sec_per_call']*1e3:.2f} ms")

    e = jax.random.normal(jax.random.key(3), (B, N, K, 64))

    conv2 = jax.jit(lambda e: jnp.sum(
        jnp.einsum("bnkc,cd->bnkd", e, params["conv2"]["w"],
                   preferred_element_type=jnp.float32)))
    s = measure(conv2, e, iters=5)
    print(f"conv2 einsum (B,N,k,64)@(64,64) f32: {s['sec_per_call']*1e3:.2f} ms")

    conv2_bf = jax.jit(lambda e: jnp.sum(
        jnp.einsum("bnkc,cd->bnkd", e.astype(jnp.bfloat16),
                   params["conv2"]["w"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)))
    s = measure(conv2_bf, e, iters=5)
    print(f"conv2 einsum bf16: {s['sec_per_call']*1e3:.2f} ms")

    bn_lrelu_max = jax.jit(lambda e: jnp.sum(jnp.max(
        jnp.where(e > 0, e, 0.2 * e) * 1.1 + 0.3, axis=2)))
    s = measure(bn_lrelu_max, e, iters=5)
    print(f"BN+lrelu+max over (B,N,k,64): {s['sec_per_call']*1e3:.2f} ms")

    # full stages via depth taps (pallas knn)
    for depth in (1, 2, 3, 10):
        f = jax.jit(functools.partial(
            lambda p, s_, x, d: jnp.sum(
                apply_dgcnn(p, s_, x, cfg, train=False, depth=d)[0]),
            d=depth))
        s = measure(f, params, state, x4, iters=5)
        print(f"forward depth={depth}: {s['sec_per_call']*1e3:.2f} ms")

    # conv6..9 tail alone: depth7->10 difference implied; measure conv7 matmul
    h = jax.random.normal(jax.random.key(4), (B, N, 1216))
    tail = jax.jit(lambda h: jnp.sum(
        jnp.einsum("bnc,cd->bnd", h, params["conv7"]["w"],
                   preferred_element_type=jnp.float32)))
    s = measure(tail, h, iters=5)
    print(f"conv7 matmul f32: {s['sec_per_call']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
