"""Fused EdgeConv epilogue kernel (eval mode).

After the neighbour gather, stages 1-2 of DGCNN apply
``max_k( act(BN_b( W2 @ act(BN_a( gathered + b )))))`` over the k-expanded
(B, N, k, C) tensor (/root/reference/model.py:116-127 + max at :150).
Unfused, XLA writes and re-reads that 458 MB (at B=8, N=7000, k=32, C=64)
tensor between the element-wise chain, the matmul and the reduction. This
kernel runs the whole epilogue on a VMEM-resident (QT, k, C) tile: one HBM
read of the gathered features, one (QT·k, C)x(C, C2) MXU matmul, one HBM
write of the (QT, C2) result.

Eval-only: BatchNorm is folded to per-channel scale/shift from running
statistics (training needs batch statistics over the full tensor and keeps
the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _epilogue_kernel(a_ref, b_ref, w2_ref, sa_ref, ta_ref, sb_ref, tb_ref,
                     out_ref, *, k: int):
    a = a_ref[0]                     # (QT, k, C)
    bvec = b_ref[0]                  # (QT, C)
    qt, kk, c = a.shape
    e = a + bvec[:, None, :]
    e = e * sa_ref[0][None, None, :] + ta_ref[0][None, None, :]
    e = jnp.where(e >= 0, e, _SLOPE * e)
    h = jax.lax.dot_general(
        e.reshape(qt * kk, c), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                # (QT*k, C2)
    h = h * sb_ref[0][None, :] + tb_ref[0][None, :]
    h = jnp.where(h >= 0, h, _SLOPE * h)
    out_ref[0] = jnp.max(h.reshape(qt, kk, -1), axis=1)


@functools.partial(
    jax.jit, static_argnames=("query_tile", "interpret")
)
def edgeconv_epilogue(
    a_gathered: jax.Array,   # (B, N, k, C) gathered first-conv activations
    b: jax.Array,            # (B, N, C) centre-term broadcast add
    w2: jax.Array,           # (C, C2) second conv weight
    scale_a: jax.Array, shift_a: jax.Array,   # folded eval BN after conv1
    scale_b: jax.Array, shift_b: jax.Array,   # folded eval BN after conv2
    *,
    query_tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """max over k of act(BN_b(W2 @ act(BN_a(a_gathered + b)))) — (B, N, C2)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, n, k, c = a_gathered.shape
    c2 = w2.shape[1]
    qt = min(query_tile, n)
    n_pad = _round_up(n, qt)
    if n_pad != n:
        a_gathered = jnp.pad(
            a_gathered, ((0, 0), (0, n_pad - n), (0, 0), (0, 0))
        )
        b = jnp.pad(b, ((0, 0), (0, n_pad - n), (0, 0)))

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, k=k),
        grid=(bsz, n_pad // qt),
        in_specs=[
            pl.BlockSpec((1, qt, k, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, c2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c2), jnp.float32),
        interpret=interpret,
    )(
        a_gathered.astype(jnp.float32), b.astype(jnp.float32),
        w2.astype(jnp.float32),
        row(scale_a), row(shift_a), row(scale_b), row(shift_b),
    )
    return out[:, :n]


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Eval BatchNorm as per-channel (scale, shift)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
