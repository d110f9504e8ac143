"""Does Mosaic's tpu.dynamic_gather beat the unrolled row-load loop?

jax 0.9 lowers ``jnp.take_along_axis(x, idx, axis=0)`` (x 2-D, idx same
shape) to ``tpu.dynamic_gather`` inside Pallas TPU kernels
(jax/_src/pallas/mosaic/lowering.py:2464-2524). If that op is a real
vectorised sublane gather on v5e, it replaces the ~4 ns/row dynamic-slice
loop (kernels/gather_pallas.py::gather_rows_loop) that is the measured
floor of the fused stage kernels (~3 ms of each 4.6-5.5 ms stage).

Measures with reps-in-jit (the only trustworthy sub-ms methodology on the
tunnelled chip — CLAUDE.md round-3 notes):
  1. correctness: small (256, 128) table, random rows;
  2. production shape (7168, 64): dynamic_gather vs gather_rows_loop
     (u=8/16) on x-sorted-local indices AND uniform-random indices;
  3. the same at C=128 (the (7168,128) table still fits VMEM).

Run ONCE in a background process:
    python scripts/exp_dyngather.py > /tmp/exp_dyngather.log 2>&1
"""

import functools
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

from dgcnn_tpu.kernels.gather_pallas import gather_rows_loop


def log(*a):
    print(*a, flush=True)


def _dg_kernel(idx_ref, table_ref, out_ref):
    idxb = jnp.broadcast_to(idx_ref[:], out_ref.shape)
    out_ref[:] = jnp.take_along_axis(table_ref[:], idxb, axis=0)


def dyn_gather(table, idx):
    """(R, C) table, (R, 1) int32 idx -> (R, C) gathered rows."""
    r, c = table.shape
    return pl.pallas_call(
        _dg_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), table.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(idx, table)


def _loop_kernel(idx_ref, table_ref, out_ref, *, rows, unroll):
    gather_rows_loop(idx_ref, table_ref, out_ref, rows, unroll)


def loop_gather(table, idx_smem, unroll):
    r, c = table.shape
    return pl.pallas_call(
        functools.partial(_loop_kernel, rows=r, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((r, c), table.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(idx_smem, table[None])


def bench(fn, reps=60, trials=5):
    float(jnp.sum(fn()))
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        out.append((time.perf_counter() - t0) / reps)
    out.sort()
    return out[trials // 2], out


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    # --- 1. correctness, small ---
    rng = np.random.default_rng(0)
    tbl = rng.normal(size=(256, 128)).astype(np.float32)
    rows = rng.integers(0, 256, size=(256, 1)).astype(np.int32)
    try:
        got = np.asarray(dyn_gather(jnp.asarray(tbl), jnp.asarray(rows)))
    except Exception as e:
        log("dynamic_gather FAILED to compile/run:",
            type(e).__name__, str(e)[:500])
        return
    want = tbl[rows[:, 0]]
    log("small correctness:", np.array_equal(got, want))

    # --- 2. production shape ---
    R = 7168
    for c in (64, 128):
        tbl = rng.normal(size=(R, c)).astype(np.float32)
        # x-sorted-local indices: within +-1024 of the row (stage-kernel
        # reality); and uniform-random (worst case)
        local = (np.arange(R) + rng.integers(-1024, 1024, R)) % R
        uni = rng.integers(0, R, R)
        for tag, ind in (("local", local), ("uniform", uni)):
            ind = ind.astype(np.int32)
            tj = jnp.asarray(tbl)
            iv = jnp.asarray(ind[:, None])          # (R, 1) VMEM
            ism = jnp.asarray(ind[None, None, :])   # (1, 1, R) SMEM

            got = np.asarray(dyn_gather(tj, iv))
            ok = np.array_equal(got, tbl[ind])
            reps = 60

            @jax.jit
            def many_dg(t, i0):
                def body(s, acc):
                    i = (i0 + s) % R
                    return acc + dyn_gather(t, i)[0]
                return jax.lax.fori_loop(0, reps, body,
                                         jnp.zeros((c,), jnp.float32))

            @functools.partial(jax.jit, static_argnames="u")
            def many_loop(t, i0, u):
                def body(s, acc):
                    i = (i0 + s) % R
                    return acc + loop_gather(t, i, u)[0]
                return jax.lax.fori_loop(0, reps, body,
                                         jnp.zeros((c,), jnp.float32))

            m_dg, band = bench(lambda: many_dg(tj, iv), reps)
            log(f"C={c} {tag}: dynamic_gather {m_dg*1e6:.0f} us/call "
                f"[{band[0]*1e6:.0f}..{band[-1]*1e6:.0f}] correct={ok}")
            for u in (8, 16):
                m_lp, band = bench(lambda: many_loop(tj, ism, u), reps)
                log(f"C={c} {tag}: loop u={u} {m_lp*1e6:.0f} us/call "
                    f"[{band[0]*1e6:.0f}..{band[-1]*1e6:.0f}]")
    log("DONE")


if __name__ == "__main__":
    main()
