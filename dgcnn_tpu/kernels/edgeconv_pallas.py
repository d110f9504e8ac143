"""Fused EdgeConv stage kernels (eval mode) with IN-KERNEL neighbour gather.

After kNN, stages 1-2 of DGCNN compute
``max_k( act(BN_b( W2 @ act(BN_a( a[idx] + b )))))`` and stage 3
``act(BN(select_by_sign(max_k/min_k of a[idx] + b)))``
(/root/reference/model.py:116-130, :161-163 + the max at :150).

The unfused XLA path materialises the gathered (B, N, k, C) tensor
(430 MB at B=8, N=7000, k=30, C=64) — the forward's non-kNN floor
(measured 9.9 ms/stage for gather+epilogue on v5e). These kernels keep the
whole (N, C) feature table resident in VMEM (1.8 MB at production shape),
gather rows with unrolled dynamic sublane loads, and run the entire stage
epilogue on the VMEM tile: per grid step ONE read of the table block
index rows, one (QT·k, C)x(C, C2) MXU matmul, one (QT, C2) HBM write. The
k-expanded tensor never exists in HBM. Measured 4.6-5.5 ms/stage
standalone on REAL (x-sorted-local) kNN indices — ~2x the XLA chain,
bit-exact against it (scripts/exp_gather_pallas.py); worst-case
uniform-random indices cost ~7 ms/stage (VMEM read locality matters,
scripts/exp_stage_unroll2.py). Defaults qt=128/unroll=16: full-forward
A/B 26.1 vs 28.3-29.0 ms at qt=64/u=8 (scripts/exp_stage_unroll4.py).

Eval-only: BatchNorm folds to per-channel scale/shift from running
statistics (training needs batch statistics over the full tensor and keeps
the XLA path with the Pallas scatter backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.2


def _pick_unroll(rows: int, want: int) -> int:
    for u in (want, 8, 4, 2, 1):
        if rows % u == 0:
            return u
    return 1


def _env_tiles(qt: int, unroll: int) -> tuple[int, int]:
    """DGCNN_STAGE_QT / DGCNN_STAGE_UNROLL override the v5e-measured
    defaults — the retuning escape hatch for other TPU generations.
    Sweep with scripts/exp_stage_sweep_precise.py (reps-in-jit standalone
    kernels on REAL indices, ~0.05 ms sensitivity), then guard any winner
    with the full-forward A/B (exp_stage_tiles_ab.py) — single-call
    sub-ms timings through a tunnelled chip are unreliable, and full-
    forward A/B alone cannot resolve <1.5 ms kernel deltas."""
    import os

    return (int(os.environ.get("DGCNN_STAGE_QT", qt)),
            int(os.environ.get("DGCNN_STAGE_UNROLL", unroll)))


# shared kernel helpers live in gather_pallas (one copy)
from dgcnn_tpu.kernels.gather_pallas import (  # noqa: E402
    _round_up,
    gather_rows_loop as _gather_to_scratch,
)


def _stage_kernel(idx_ref, table_ref, b_ref, w2_ref, sa_ref, ta_ref,
                  sb_ref, tb_ref, out_ref, g_scr, *, qt, k, unroll,
                  bf16_mm=False):
    rows = qt * k
    _gather_to_scratch(idx_ref, table_ref, g_scr, rows, unroll)
    g = g_scr[:].reshape(qt, k, -1)
    e = g + b_ref[0][:, None, :]
    e = e * sa_ref[0][None, None, :] + ta_ref[0][None, None, :]
    e = jnp.where(e >= 0, e, _SLOPE * e)
    c = e.shape[-1]
    lhs = e.reshape(rows, c)
    w2 = w2_ref[:]
    if bf16_mm:
        # compute_dtype="bfloat16" semantics: the second conv's operands
        # in bf16, f32 accumulation — mirrors _mm()/edge_conv_linear's
        # cast-then-einsum so the fused path matches the XLA chain
        lhs, w2 = lhs.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    h = jax.lax.dot_general(
        lhs, w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h * sb_ref[0][None, :] + tb_ref[0][None, :]
    h = jnp.where(h >= 0, h, _SLOPE * h)
    out_ref[0] = jnp.max(h.reshape(qt, k, -1), axis=1)


@functools.partial(jax.jit, static_argnames=("qt", "unroll", "interpret",
                                              "bf16_mm"))
def edgeconv_fused_stage(
    table: jax.Array,        # (B, N, C) first-conv point activations a=x@W_d
    idx: jax.Array,          # (B, N, k) int32 neighbour indices
    bvec: jax.Array,         # (B, N, C) centre term x@(W_x-W_d)
    w2: jax.Array,           # (C, C2) second conv weight
    scale_a: jax.Array, shift_a: jax.Array,   # folded eval BN after conv a
    scale_b: jax.Array, shift_b: jax.Array,   # folded eval BN after conv b
    *,
    qt: int = 64,
    unroll: int = 32,
    interpret: bool | None = None,
    bf16_mm: bool = False,
) -> jax.Array:
    """max_k(act(BNb(W2 @ act(BNa(table[idx] + bvec))))) -> (B, N, C2),
    gathering inside the kernel (the (B,N,k,C) tensor never hits HBM).
    ``bf16_mm`` runs the second conv with bf16 operands (f32 accumulate)
    — the ``compute_dtype="bfloat16"`` semantics; everything else in the
    stage (gather, add, BN, LReLU, max) is elementwise f32 either way."""
    # env overrides resolve at trace time — set them before first use
    # (the jit cache is keyed on the passed qt/unroll, not the env)
    qt, unroll = _env_tiles(qt, unroll)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = table.shape
    k = idx.shape[-1]
    c2 = w2.shape[1]
    unroll = _pick_unroll(qt * k, unroll)
    n_pad = _round_up(n, max(qt, 8))
    if n_pad != n:
        table = jnp.pad(table, ((0, 0), (0, n_pad - n), (0, 0)))
        bvec = jnp.pad(bvec, ((0, 0), (0, n_pad - n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
    nq = n_pad // qt
    idx3 = idx.reshape(b * nq, 1, qt * k).astype(jnp.int32)

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_stage_kernel, qt=qt, k=k, unroll=unroll,
                          bf16_mm=bf16_mm),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, qt * k),
                         lambda bb, qq, nq=nq: (bb * nq + qq, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, c), lambda bb, qq: (bb, 0, 0)),
            pl.BlockSpec((1, qt, c), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((c, c2), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c2), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c2), lambda bb, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qt, c2), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qt * k, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        idx3, table.astype(jnp.float32), bvec.astype(jnp.float32),
        w2.astype(jnp.float32),
        row(scale_a), row(shift_a), row(scale_b), row(shift_b),
    )
    return out[:, :n]


def _extrema_kernel(idx_ref, table_ref, b_ref, pos_ref, s_ref, t_ref,
                    out_ref, g_scr, *, qt, k, unroll):
    rows = qt * k
    _gather_to_scratch(idx_ref, table_ref, g_scr, rows, unroll)
    g = g_scr[:].reshape(qt, k, -1)
    mx = jnp.max(g, axis=1) + b_ref[0]
    mn = jnp.min(g, axis=1) + b_ref[0]
    sel = jnp.where(pos_ref[0][None, :] > 0, mx, mn)
    y = sel * s_ref[0][None, :] + t_ref[0][None, :]
    out_ref[0] = jnp.where(y >= 0, y, _SLOPE * y)


@functools.partial(jax.jit, static_argnames=("qt", "unroll", "interpret"))
def edgeconv_fused_extrema(
    table: jax.Array,        # (B, N, C) conv5 point activations a=x@W_d
    idx: jax.Array,          # (B, N, k)
    bvec: jax.Array,         # (B, N, C)
    gamma: jax.Array,        # (C,) BN gamma — selects max vs min
    scale: jax.Array, shift: jax.Array,       # folded eval BN
    *,
    qt: int = 128,
    unroll: int = 32,
    interpret: bool | None = None,
) -> jax.Array:
    """Stage-3 fused: act(BN(select_by_sign(gamma, max_k, min_k of
    table[idx] + bvec))) -> (B, N, C). The max-through-BN monotonicity fold
    (ops/edgeconv.py::edge_conv_linear_extrema) with the gather in VMEM."""
    qt, unroll = _env_tiles(qt, unroll)  # see edgeconv_fused_stage
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = table.shape
    k = idx.shape[-1]
    unroll = _pick_unroll(qt * k, unroll)
    n_pad = _round_up(n, max(qt, 8))
    if n_pad != n:
        table = jnp.pad(table, ((0, 0), (0, n_pad - n), (0, 0)))
        bvec = jnp.pad(bvec, ((0, 0), (0, n_pad - n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
    nq = n_pad // qt
    idx3 = idx.reshape(b * nq, 1, qt * k).astype(jnp.int32)

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    pos = (gamma >= 0).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_extrema_kernel, qt=qt, k=k, unroll=unroll),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, qt * k),
                         lambda bb, qq, nq=nq: (bb * nq + qq, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, c), lambda bb, qq: (bb, 0, 0)),
            pl.BlockSpec((1, qt, c), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((1, c), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qt, c), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qt * k, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        idx3, table.astype(jnp.float32), bvec.astype(jnp.float32),
        row(pos), row(scale), row(shift),
    )
    return out[:, :n]


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Eval BatchNorm as per-channel (scale, shift)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
