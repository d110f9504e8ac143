"""Pallas VMEM-accumulator scatter-add vs XLA scatter (train backward).

Times the PRODUCTION kernel (dgcnn_tpu/kernels/scatter_pallas.py — the
gather_neighbors custom-VJP backward) against XLA's scatter at the
train-step shape. Run on TPU."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows
from dgcnn_tpu.utils.profiling import measure

B, N, K, C = 8, 7000, 30, 64
M = N * K


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def xla_scatter(dy, idx, n):
    b, m, c = dy.shape
    out = jnp.zeros((b, n, c), dy.dtype)
    return out.at[jnp.arange(b)[:, None], idx].add(dy)


def main():
    log(f"backend: {jax.default_backend()}")
    dy = jax.random.normal(jax.random.key(1), (B, M, C), jnp.float32)
    idx = jax.random.randint(jax.random.key(2), (B, M), 0, N)

    f_x = jax.jit(lambda d, i: xla_scatter(d, i, N))
    want = f_x(dy, idx)
    for chunk in (1024, 2048, 4096):
        f_p = jax.jit(lambda d, i, ch=chunk: scatter_add_pallas(d, i, N, ch))
        got = f_p(dy, idx)
        err = float(jnp.max(jnp.abs(got - want)))
        t = measure(f_p, dy, idx, iters=5)["sec_per_call"] * 1e3
        log(f"pallas chunk={chunk}: {t:7.2f} ms (max err {err:.1e})")
    t = measure(f_x, dy, idx, iters=5)["sec_per_call"] * 1e3
    log(f"xla scatter:        {t:7.2f} ms")
    print("EXP DONE")


if __name__ == "__main__":
    main()
