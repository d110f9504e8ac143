"""Component-level TPU timing: where does the forward go?

Timing protocol for the remote (tunnelled) device: per-measurement scalar
sync; subtract the bare round-trip measured on a trivial kernel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync_time(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    return (time.perf_counter() - t0) / iters


@jax.jit
def trivial(a):
    return jnp.sum(a)


def main():
    a = jnp.ones((8, 128))
    rt = sync_time(trivial, a, iters=10)
    print(f"round-trip: {rt*1e3:.1f} ms")

    B, N, K = 8, 7000, 30
    x4 = jax.random.normal(jax.random.key(0), (B, N, 4))
    x64 = jax.random.normal(jax.random.key(1), (B, N, 64))

    from dgcnn_tpu.ops.knn import knn

    for name, arr, chunk in (
        ("knn F=4 chunk1024", x4, 1024),
        ("knn F=64 chunk1024", x64, 1024),
        ("knn F=64 full", x64, None),
    ):
        f = jax.jit(functools.partial(knn, k=K, query_chunk=chunk))
        dt = sync_time(f, arr) - rt
        print(f"{name}: {dt*1e3:.1f} ms")

    # approx top-k path
    def knn_approx(x):
        xx = jnp.sum(x * x, axis=-1)
        def step(_, q):
            s = 2 * jnp.einsum("bqc,bnc->bqn", q, x,
                               preferred_element_type=jnp.float32) - xx[:, None, :]
            _, idx = jax.lax.approx_max_k(s, K, recall_target=0.95)
            return None, idx
        qs = x.reshape(B, N // 1000, 1000, -1)
        _, idx = jax.lax.scan(step, None, jnp.swapaxes(qs, 0, 1))
        return jnp.swapaxes(idx, 0, 1)

    f = jax.jit(knn_approx)
    dt = sync_time(f, x64) - rt
    print(f"knn F=64 approx_max_k: {dt*1e3:.1f} ms")

    # distance matmul alone (no top-k)
    def dists_only(x):
        xx = jnp.sum(x * x, axis=-1)
        def step(c, q):
            s = 2 * jnp.einsum("bqc,bnc->bqn", q, x,
                               preferred_element_type=jnp.float32) - xx[:, None, :]
            return c + jnp.sum(s), None
        qs = x.reshape(B, N // 1000, 1000, -1)
        c, _ = jax.lax.scan(step, 0.0, jnp.swapaxes(qs, 0, 1))
        return c

    f = jax.jit(dists_only)
    dt = sync_time(f, x64) - rt
    print(f"dist-matmul F=64 only: {dt*1e3:.1f} ms")

    # full forward by depth taps
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      compute_dtype="bfloat16")
    params, state = init_dgcnn(jax.random.key(2), cfg)
    for depth in (1, 2, 3, 10):
        f = jax.jit(functools.partial(
            lambda p, s, x, d: apply_dgcnn(p, s, x, cfg, train=False, depth=d)[0],
            d=depth))
        dt = sync_time(f, params, state, x4) - rt
        print(f"forward depth={depth}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
