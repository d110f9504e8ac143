"""kNN implementation shootout on the TPU."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync_time(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    _ = float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


@jax.jit
def trivial(a):
    return jnp.sum(a)


def main():
    rt = sync_time(trivial, jnp.ones((8, 128)), iters=10)
    print(f"round-trip {rt*1e3:.1f} ms")

    from dgcnn_tpu.kernels.knn_pallas import knn_pallas
    from dgcnn_tpu.ops.knn import knn

    B, N, K = 8, 7000, 30
    for C in (4, 64):
        x = jax.random.normal(jax.random.key(C), (B, N, C))
        impls = {
            "xla_exact": jax.jit(functools.partial(knn, k=K, query_chunk=1024)),
            "approx95": jax.jit(functools.partial(
                knn, k=K, query_chunk=1024, approx=True)),
            "pallas qt=256": jax.jit(functools.partial(
                knn_pallas, k=K, query_tile=256)),
            "pallas qt=512": jax.jit(functools.partial(
                knn_pallas, k=K, query_tile=512)),
            "pallas qt=128": jax.jit(functools.partial(
                knn_pallas, k=K, query_tile=128)),
        }
        for name, fn in impls.items():
            try:
                dt = sync_time(fn, x) - rt
                print(f"C={C} {name}: {dt*1e3:.1f} ms")
            except Exception as e:
                print(f"C={C} {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # correctness cross-check on device
    x = jax.random.normal(jax.random.key(9), (2, 1000, 8))
    import numpy as np

    a = np.asarray(knn(x, 10, query_chunk=None))
    b = np.asarray(knn_pallas(x, 10))
    match = (a == b).mean()
    print(f"device exact-match pallas vs xla: {match*100:.3f}%")


if __name__ == "__main__":
    main()
