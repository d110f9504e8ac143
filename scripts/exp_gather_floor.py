"""Probe the in-VMEM row-gather floor (cycles/row) with loop-structure
variants.

The corrected attribution (BASELINE.md) puts the fused stage kernels at
~3.1-3.2 cycles/row, "near the dynamic row-load floor". Untested so far:
the destination STORES are dynamically addressed too (``gather_rows_loop``
runs a ``lax.fori_loop(unroll=False)`` whose induction variable feeds the
store offset). Variants probed here, reps-in-jit (the only method with
sub-0.1 ms sensitivity through the tunnelled chip — see
exp_stage_sweep_precise.py):

  A. production loop (dynamic base, unroll u)            [control]
  B. fully Python-unrolled copy loop — STATIC store offsets, static SMEM
     index offsets; only the table row address stays dynamic
  C. B but destination writes coalesced: accumulate ``u`` rows into one
     static (u, C) tile via concatenate, single static store
  D. A with the table lane-padded to C=128 (does the 64-lane sublane
     load lower differently?)

Each variant runs as a standalone pure-gather kernel on REAL stage-2
indices captured from the production forward, B=8 N=7000 k=30 C=64
(1.68M rows). cycles/row assumes 940 MHz v5e.

    python scripts/exp_gather_floor.py > /tmp/exp_gather_floor.log 2>&1
"""

import functools
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dgcnn_tpu.models.dgcnn as dg
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
REPS = 16
MHZ = 940.0
ORIG_KNN = dg._knn


def log(*a):
    print(*a, flush=True)


# --- kernel bodies -----------------------------------------------------


def body_dynamic(idx_ref, table_ref, out_ref, *, rows, unroll):
    """Variant A: the production loop (gather_pallas.gather_rows_loop)."""

    def body(i, _):
        base = i * unroll
        for u in range(unroll):
            t = idx_ref[0, 0, base + u]
            out_ref[0, pl.dslice(base + u, 1), :] = table_ref[
                0, pl.dslice(t, 1), :
            ]
        return 0

    jax.lax.fori_loop(0, rows // unroll, body, 0, unroll=False)


def body_static(idx_ref, table_ref, out_ref, *, rows, unroll):
    """Variant B: fully unrolled — static store offsets."""
    del unroll
    for r in range(rows):
        t = idx_ref[0, 0, r]
        out_ref[0, pl.dslice(r, 1), :] = table_ref[0, pl.dslice(t, 1), :]


def body_coalesced(idx_ref, table_ref, out_ref, *, rows, unroll):
    """Variant C: concatenate u loaded rows, one static (u, C) store."""
    for base in range(0, rows, unroll):
        rs = [
            table_ref[0, pl.dslice(idx_ref[0, 0, base + u], 1), :]
            for u in range(unroll)
        ]
        out_ref[0, pl.dslice(base, unroll), :] = jnp.concatenate(rs, axis=0)


# --- harness -----------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("body", "qt", "unroll", "cpad"))
def run_gather(table, idx, *, body, qt, unroll, cpad=None):
    b, n, c = table.shape
    if cpad and cpad != c:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, cpad - c)))
        c = cpad
    k = idx.shape[-1]
    n_pad = -(-n // max(qt, 8)) * max(qt, 8)
    if n_pad != n:
        table = jnp.pad(table, ((0, 0), (0, n_pad - n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
    nq = n_pad // qt
    rows = qt * k
    idx3 = idx.reshape(b * nq, 1, rows).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(body, rows=rows, unroll=unroll),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, rows),
                         lambda bb, qq, nq=nq: (bb * nq + qq, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, c), lambda bb, qq: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c),
                               lambda bb, qq, nq=nq: (bb * nq + qq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nq, rows, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(idx3, table)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped")
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    traced = []

    def capture(x, cfg_, **kw):
        out = ORIG_KNN(x, cfg_, **kw)
        traced.append(out)
        return out

    dg._knn = capture

    @jax.jit
    def run_capture(p, s, xx):
        traced.clear()
        lg = apply_dgcnn(p, s, xx, cfg, train=False)[0]
        return lg, tuple(traced)

    _, captured = run_capture(params, bn, pts)
    dg._knn = ORIG_KNN
    idx2 = jnp.asarray(np.asarray(captured[1]))

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((B, N, 64)).astype(np.float32))
    total_rows = B * N * K

    # correctness first (vs XLA take_along_axis), on a small slice
    ref = jnp.take_along_axis(
        table[:, :, None, :],
        jnp.asarray(idx2)[:, :, :, None].astype(jnp.int32), axis=1,
    )  # (B, N, k, C) -- compare reshaped

    def check(body, qt, unroll, cpad=None, name=""):
        out = run_gather(table, idx2, body=body, qt=qt, unroll=unroll,
                         cpad=cpad)
        b, n, c0 = table.shape
        nq = -(-n // max(qt, 8)) * max(qt, 8) // qt
        got = out.reshape(b, nq * qt, K, -1)[:, :n, :, :64]
        ok = bool(jnp.all(got == ref))
        log(f"  parity {name}: {'OK' if ok else 'FAIL'}")
        return ok

    def timed(body, qt, unroll, cpad=None):
        @jax.jit
        def many(t, ix):
            def step(i, carry):
                drift, acc = carry
                out = run_gather(t + drift, ix, body=body, qt=qt,
                                 unroll=unroll, cpad=cpad)
                s = jnp.sum(out[::7, 0, 0]) * 1e-30
                return (drift + s, acc + s)

            return jax.lax.fori_loop(
                0, REPS, step, (jnp.float32(0), jnp.float32(0)))[1]

        t0 = time.perf_counter()
        float(many(table, idx2))
        compile_s = time.perf_counter() - t0
        float(many(table, idx2))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(table, idx2))
            trials.append((time.perf_counter() - t0 - rt) / REPS)
        med = statistics.median(trials) * 1e3
        cyc = med * 1e-3 * MHZ * 1e6 / total_rows
        return med, min(trials) * 1e3, max(trials) * 1e3, cyc, compile_s

    cases = [
        ("A dyn  qt=64  u=16", body_dynamic, 64, 16, None),
        ("A dyn  qt=64  u=32", body_dynamic, 64, 32, None),
        ("A dyn  qt=128 u=32", body_dynamic, 128, 32, None),
        ("B stat qt=64       ", body_static, 64, 1, None),
        ("B stat qt=128      ", body_static, 128, 1, None),
        ("C coal qt=64  u=8  ", body_coalesced, 64, 8, None),
        ("D dyn  qt=64 u=32 c128", body_dynamic, 64, 32, 128),
    ]
    check(body_dynamic, 64, 16, name="A")
    check(body_static, 64, 1, name="B")
    check(body_coalesced, 64, 8, name="C")
    for name, body, qt, u, cpad in cases:
        try:
            med, lo, hi, cyc, cs = timed(body, qt, u, cpad)
            log(f"{name}: {med:6.2f} ms [{lo:.2f}..{hi:.2f}] "
                f"= {cyc:.2f} cyc/row  (compile {cs:.0f}s)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    log("DONE")


if __name__ == "__main__":
    main()
