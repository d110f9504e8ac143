"""dynamic_gather support-boundary sweep on the real chip.

exp_dyngather.py's (256, 128) dim-0 gather died in the Mosaic backend
(remote-compile HTTP 500, no detail). This sweep bisects WHAT compiles:
table heights 8..2048 on dim 0, a dim-1 (lane) variant, explicit (R, C)
indices vs in-kernel broadcast, and i32 vs padded-lane tables, catching
per-case errors.

    python scripts/exp_dyngather2.py > /tmp/exp_dyngather2.log 2>&1
"""

import sys

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


def log(*a):
    print(*a, flush=True)


def _dg0_full(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


def _dg0_bcast(idx_ref, table_ref, out_ref):
    idxb = jnp.broadcast_to(idx_ref[:], out_ref.shape)
    out_ref[:] = jnp.take_along_axis(table_ref[:], idxb, axis=0)


def _dg1_full(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=1)


def run(kernel, table, idx, name):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
        )(jnp.asarray(idx), jnp.asarray(table))
        got = np.asarray(out)
        return got
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}")
        return None


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    for r in (8, 16, 32, 64, 128, 256, 512, 1024, 2048):
        tbl = rng.normal(size=(r, 128)).astype(np.float32)
        ind = rng.integers(0, r, size=(r, 128)).astype(np.int32)
        got = run(_dg0_full, tbl, ind, f"dim0 full-idx R={r}")
        if got is not None:
            want = tbl[ind, np.arange(128)[None, :]]
            log(f"dim0 full-idx R={r}: ok correct={np.array_equal(got, want)}")

    tbl = rng.normal(size=(256, 128)).astype(np.float32)
    ind = rng.integers(0, 256, size=(256, 1)).astype(np.int32)
    got = run(_dg0_bcast, tbl, ind, "dim0 bcast R=256")
    if got is not None:
        want = tbl[ind[:, 0]]
        log(f"dim0 bcast R=256: ok correct={np.array_equal(got, want)}")

    for c in (128, 256):
        tbl = rng.normal(size=(64, c)).astype(np.float32)
        ind = rng.integers(0, c, size=(64, c)).astype(np.int32)
        got = run(_dg1_full, tbl, ind, f"dim1 full-idx C={c}")
        if got is not None:
            want = np.take_along_axis(tbl, ind, 1)
            log(f"dim1 full-idx C={c}: ok correct={np.array_equal(got, want)}")
    log("DONE")


if __name__ == "__main__":
    main()
