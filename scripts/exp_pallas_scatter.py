"""Pallas VMEM-accumulator scatter-add vs XLA scatter (train backward).

The gather-VJP scatter ((B, N*k, 64) rows -> (B, N, 64)) costs ~25 ms in
XLA regardless of row width. This kernel keeps the (N, 64) output resident
in VMEM across input chunks of one batch element and applies rows with
dynamic sublane stores. Run on TPU.
"""

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgcnn_tpu.utils.profiling import measure

B, N, K, C = 8, 7000, 30, 64
M = N * K


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(idx_ref, dy_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    chunk = dy_ref.shape[1]

    def body(r, _):
        t = idx_ref[0, 0, r]
        row = dy_ref[0, r, :]
        out_ref[0, pl.dslice(t, 1), :] += row[None, :]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n", "chunk"))
def scatter_add_pallas(dy, idx, n, chunk=2048):
    b, m, c = dy.shape
    nchunk = (m + chunk - 1) // chunk
    pad = nchunk * chunk - m
    if pad:  # padded rows dump into an extra row n (sliced off below)
        idx = jnp.concatenate(
            [idx, jnp.full((b, pad), n, idx.dtype)], axis=1)
        dy = jnp.concatenate(
            [dy, jnp.zeros((b, pad, c), dy.dtype)], axis=1)
    idx3 = idx.reshape(b * nchunk, 1, chunk).astype(jnp.int32)
    dy3 = dy.reshape(b, nchunk * chunk, c)
    out = pl.pallas_call(
        _kernel,
        grid=(b, nchunk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk),
                lambda bb, cc, nchunk=nchunk: (bb * nchunk + cc, 0, 0),
                memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, c), lambda bb, cc: (bb, cc, 0)),
        ],
        out_specs=pl.BlockSpec((1, n + 8, c), lambda bb, cc: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n + 8, c), dy.dtype),
    )(idx3, dy3)
    return out[:, :n]


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
