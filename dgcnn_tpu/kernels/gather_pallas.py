"""Pallas row-gather: the forward mirror of scatter_pallas.

Keeps the (N, C) feature table of one batch element resident in VMEM and
materialises gathered rows with unrolled dynamic sublane loads. Measured
(B=8, N=7000, k=30, C=64 on v5e): 6-7 ms at unroll=8 vs ~53 ms for the
standalone XLA gather of the same rows (scripts/exp_gather_pallas.py) —
XLA's row-gather is HBM-random-read bound while the table here is a 1.8 MB
VMEM tile.

Status: :func:`gather_rows` is an OPT-IN study knob for the training
forward (``DGCNN_GATHER_IMPL=pallas`` in ops/edgeconv.py; default "xla" —
measured SLOWER in the full train program, 105 vs 91 ms/step, because XLA
fuses its gather into the BN-stat sweep and other consumers while this
materialises the tensor standalone; DESIGN.md round-3 dead ends). The
shared :func:`gather_rows_loop` body IS production code — the fused eval
stage kernels (kernels/edgeconv_pallas.py) run it against their VMEM
scratch, where it wins ~2x per stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def gather_rows_loop(idx_ref, table_ref, dst_ref, rows: int, unroll: int):
    """``dst_ref[r, :] = table_ref[0, idx_ref[0, 0, r], :]`` for r in
    [0, rows) — THE tuned in-VMEM row-gather loop (unrolled dynamic
    sublane loads; u=8 measured ~2.3x u=1 on v5e). ``rows`` must be a
    multiple of ``unroll``. Shared by :func:`gather_rows` and the fused
    stage kernels in kernels/edgeconv_pallas.py — retune here only."""

    def body(i, _):
        base = i * unroll
        for u in range(unroll):
            t = idx_ref[0, 0, base + u]
            dst_ref[pl.dslice(base + u, 1), :] = table_ref[
                0, pl.dslice(t, 1), :
            ]
        return 0

    jax.lax.fori_loop(0, rows // unroll, body, 0, unroll=False)


def _kernel(idx_ref, table_ref, out_ref, *, rows, unroll):
    gather_rows_loop(idx_ref, table_ref, out_ref.at[0], rows, unroll)


@functools.partial(
    jax.jit, static_argnames=("chunk", "unroll", "interpret")
)
def gather_rows(
    table: jax.Array,
    idx: jax.Array,
    *,
    chunk: int = 1920,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """out[b, m] = table[b, idx[b, m]] — (B, M, C) from (B, N, C).

    Args:
        table: (B, N, C) feature table (resident in VMEM per batch
            element; N*C*4 bytes must fit the scoped window).
        idx: (B, M) int32 row indices in [0, N).
        chunk: rows per grid step (the idx slice rides SMEM).
        unroll: independent loads per loop iteration (ILP; u=8 measured
            ~2.3x u=1 on v5e).
    """
    b, n, c = table.shape
    m = idx.shape[1]
    while chunk % unroll:
        unroll //= 2
    nchunk = -(-m // chunk)
    pad = nchunk * chunk - m
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((b, pad), idx.dtype)], 1)
    n_pad = _round_up(n, 8)
    if n_pad != n:
        table = jnp.pad(table, ((0, 0), (0, n_pad - n), (0, 0)))
    idx3 = idx.reshape(b * nchunk, 1, chunk).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=chunk, unroll=unroll),
        grid=(b, nchunk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk),
                lambda bb, cc, nchunk=nchunk: (bb * nchunk + cc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, n_pad, c), lambda bb, cc: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda bb, cc: (bb, cc, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nchunk * chunk, c), table.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(idx3, table)
    return out[:, :m]
