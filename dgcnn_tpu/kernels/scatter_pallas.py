"""Pallas scatter-add for the EdgeConv gather backward.

The train step's dominant backward cost is the gather-VJP scatter-add
((B, N·k, C) cotangent rows into (B, N, C)); XLA's scatter is row-latency
bound at ~26 ms per stage (B=8, N=7000, k=30, C=64 on v5e). This kernel
keeps the whole (N, C) accumulator resident in VMEM across input chunks of
one batch element and applies rows with dynamic sublane stores — measured
13.4 ms for the same shape (chunk=2048), bit-correct up to f32 accumulation
order.

Used by :func:`dgcnn_tpu.ops.edgeconv.gather_neighbors` as a custom VJP on
the TPU backend; everywhere else the XLA scatter remains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, dy_ref, out_ref, *accs, nchunk, unroll=1):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)
        for a in accs:
            a[...] = jnp.zeros_like(a)

    chunk = dy_ref.shape[1]
    ncopies = 1 + len(accs)

    if ncopies == 1:
        def body(r, _):
            t = idx_ref[0, 0, r]
            out_ref[0, pl.dslice(t, 1), :] += dy_ref[0, r, :][None, :]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)
    else:
        # Rotate rows across independent accumulator copies: consecutive
        # iterations' read-modify-write chains hit DISJOINT arrays, so the
        # load of row r+1's accumulator can issue while row r's store
        # drains (the single-accumulator loop serialises on the possible
        # same-address hazard). ``unroll`` rows per copy per fori step
        # amortise the loop bookkeeping; rows hitting the SAME copy stay
        # ``ncopies`` issue slots apart, so the hazard distance is
        # unchanged. Copies are summed into out on the last grid step.
        def body(i, _):
            r = i * ncopies * unroll
            for t_off in range(unroll):
                base = r + t_off * ncopies
                t = idx_ref[0, 0, base]
                out_ref[0, pl.dslice(t, 1), :] += dy_ref[0, base, :][None, :]
                for j, a in enumerate(accs):
                    tj = idx_ref[0, 0, base + 1 + j]
                    a[pl.dslice(tj, 1), :] += (
                        dy_ref[0, base + 1 + j, :][None, :]
                    )
            return 0

        # chunk is padded to a multiple of ncopies*unroll by the caller
        jax.lax.fori_loop(0, chunk // (ncopies * unroll), body, 0,
                          unroll=False)

        @pl.when(c == nchunk - 1)
        def _merge():
            total = out_ref[0]
            for a in accs:
                total = total + a[...]
            out_ref[0] = total


def _stage_tail_kernel(
    idx_ref, u_ref, w_ref, am_ref, out_ref, *accs, nchunk, k
):
    """Scatter-add of stage-tail cotangent rows COMPUTED IN-KERNEL.

    Row (q, j)'s value is ``u[q, :] * (am[q, :] == j) + w[q, :]`` — the
    max-sparse part plus the q-only dense part of the BN backward (see
    ops/edgeconv.py::edge_stage_tail_train). The (B, N, k, C) cotangent
    tensor therefore never exists in HBM: per grid step the kernel streams
    one aligned (qb, L) block of each q-table and loops q-grouped — the
    k rows of one q share its table rows, and ``j`` is a python constant
    inside the unrolled inner loop, so the compare folds to a vector-vs-
    scalar select. Rows of one q target DISTINCT rows (kNN indices are
    distinct per query), so the within-q RMW chain is hazard-free; the
    ``j % ncopies`` accumulator rotation breaks the cross-q chains exactly
    like :func:`scatter_add_rows`'s row rotation.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)
        for a in accs:
            a[...] = jnp.zeros_like(a)

    qb = u_ref.shape[1]
    refs = [out_ref.at[0]] + list(accs)
    ncopies = len(refs)

    def body(qi, _):
        u = u_ref[0, pl.dslice(qi, 1), :]
        w = w_ref[0, pl.dslice(qi, 1), :]
        am = am_ref[0, pl.dslice(qi, 1), :]
        base = qi * k
        for j in range(k):
            t = idx_ref[0, 0, base + j]
            val = jnp.where(am == j, u, 0.0) + w
            r = refs[j % ncopies]
            r[pl.dslice(t, 1), :] += val
        return 0

    jax.lax.fori_loop(0, qb, body, 0, unroll=False)

    if ncopies > 1:
        @pl.when(c == nchunk - 1)
        def _merge():
            total = out_ref[0]
            for a in accs:
                total = total + a[...]
            out_ref[0] = total


@functools.partial(
    jax.jit,
    static_argnames=("k", "n", "q_block", "interpret", "copies"),
)
def scatter_stage_tail_rows(
    u: jax.Array,
    w: jax.Array,
    am: jax.Array,
    idx: jax.Array,
    *,
    k: int,
    n: int,
    q_block: int = 64,
    interpret: bool = False,
    copies: int = 8,
) -> jax.Array:
    """``out[b, idx[b, q, j]] += u[b, q] * (am[b, q] == j) + w[b, q]``.

    The EdgeConv single-conv stage-tail backward scatter with the
    cotangent rows computed in-kernel from q-indexed tables (the caller
    reserves a lane of ``w`` set to 1.0 — with the matching ``u`` lane 0
    and ``am`` lane -1 — to accumulate the per-row hit COUNT in the same
    RMW, see ops/edgeconv.py::edge_stage_tail_train).

    Args:
        u: (B, N, L) float32 — max-routed part (gamma*inv*gp), lane-padded.
        w: (B, N, L) float32 — q-only dense part (count lane = 1.0).
        am: (B, N, L) int32 — argmax k-slot per (q, channel); pad lanes -1.
        idx: (B, N, k) int32 targets in [0, n).
        k: neighbours per query (static).
        n: output row count.
        q_block: queries per grid step (their k rows share one table
            block; N is padded to a multiple).
        copies: accumulator copies rotated over j (j % copies).

    Returns:
        (B, n, L) float32 sums (count in the reserved lane).
    """
    b, nq, l = u.shape
    assert idx.shape == (b, nq, k) and am.shape == (b, nq, l)
    copies = max(min(copies, k), 1)
    n_pad_q = -(-nq // q_block) * q_block
    if n_pad_q != nq:
        pad = n_pad_q - nq
        u = jnp.concatenate([u, jnp.zeros((b, pad, l), u.dtype)], 1)
        w = jnp.concatenate([w, jnp.zeros((b, pad, l), w.dtype)], 1)
        am = jnp.concatenate([am, jnp.full((b, pad, l), -1, am.dtype)], 1)
        # padded queries dump zero rows into scratch row n
        idx = jnp.concatenate(
            [idx, jnp.full((b, pad, k), n, idx.dtype)], 1
        )
    nchunk = n_pad_q // q_block
    idx3 = idx.reshape(b * nchunk, 1, q_block * k).astype(jnp.int32)
    n_out = -(-(n + 1) // 8) * 8
    out = pl.pallas_call(
        functools.partial(_stage_tail_kernel, nchunk=nchunk, k=k),
        grid=(b, nchunk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, q_block * k),
                lambda bb, cc, nchunk=nchunk: (bb * nchunk + cc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, q_block, l), lambda bb, cc: (bb, cc, 0)),
            pl.BlockSpec((1, q_block, l), lambda bb, cc: (bb, cc, 0)),
            pl.BlockSpec((1, q_block, l), lambda bb, cc: (bb, cc, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_out, l), lambda bb, cc: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_out, l), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_out, l), u.dtype) for _ in range(copies - 1)
        ],
        compiler_params=pltpu.CompilerParams(
            # accumulators (out block + copies-1 scratch) + IO-block slack;
            # the caller budgets the accumulator footprint
            # (ops/edgeconv.py::_edge_stage_tail_bwd)
            vmem_limit_bytes=max(64 * 2**20,
                                 copies * n_out * l * 4 + 8 * 2**20),
        ),
        interpret=interpret,
    )(idx3, u, w, am)
    return out[:, :n]


@functools.partial(
    jax.jit, static_argnames=("n", "chunk", "interpret", "copies", "unroll")
)
def scatter_add_rows(
    dy: jax.Array,
    idx: jax.Array,
    n: int,
    *,
    chunk: int = 2048,
    interpret: bool = False,
    copies: int = 1,
    unroll: int = 1,
) -> jax.Array:
    """out[b, idx[b, m]] += dy[b, m]  — exact up to f32 sum order.

    Args:
        dy: (B, M, C) float32 update rows.
        idx: (B, M) int32 target rows in [0, n).
        n: output row count.
        chunk: rows per grid step (VMEM holds (chunk, C) dy + the full
            (n+8, C) accumulator; 2048 measured fastest on v5e).
        copies: independent VMEM accumulator copies rotated across rows
            (breaks the serial same-address RMW hazard chain; copies are
            summed on the last grid step). 1 = the original single-
            accumulator loop.
        unroll: rows per copy per fori step (multi-copy path only) —
            amortises loop bookkeeping without shrinking the hazard
            distance between same-copy rows.

    Returns:
        (B, n, C) float32 sums.
    """
    b, m, c = dy.shape
    if copies == 1:
        unroll = 1
    if chunk % (copies * unroll):
        raise ValueError(
            f"chunk {chunk} not divisible by copies*unroll "
            f"{copies}*{unroll}")
    nchunk = -(-m // chunk)
    pad = nchunk * chunk - m
    if pad:  # padded rows dump into scratch row n (sliced off below)
        idx = jnp.concatenate([idx, jnp.full((b, pad), n, idx.dtype)], 1)
        dy = jnp.concatenate([dy, jnp.zeros((b, pad, c), dy.dtype)], 1)
    idx3 = idx.reshape(b * nchunk, 1, chunk).astype(jnp.int32)
    dy3 = dy.reshape(b, nchunk * chunk, c)
    n_out = -(-(n + 1) // 8) * 8  # row n = pad dump; rows 8-aligned
    out = pl.pallas_call(
        functools.partial(_kernel, nchunk=nchunk, unroll=unroll),
        grid=(b, nchunk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk),
                lambda bb, cc, nchunk=nchunk: (bb * nchunk + cc, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, chunk, c), lambda bb, cc: (bb, cc, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_out, c), lambda bb, cc: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_out, c), dy.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_out, c), dy.dtype) for _ in range(copies - 1)
        ],
        # accumulator copies + pipelined dy chunks overflow Mosaic's
        # default 16 MiB scoped-VMEM window (v5e has 128 MiB per core)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(idx3, dy3)
    return out[:, :n]
