"""Mosaic dynamic_gather probe (round-4 candidate resolution).

jax 0.9.0 lowers in-kernel jnp.take_along_axis(x, idx, axis=0) with
idx.shape == x.shape to tpu.dynamic_gather. Measured on v5e: the op is
VREG-LOCAL — (8,128) compiles and validates, any cross-vreg span (64+,
1024, 7168 sublanes) fails Mosaic compile. So no vectorised global row
gather exists to replace the fused stage kernels' unrolled dynamic
sublane loads (~4 ns/row); emulating windowed gathers from 8-row
shuffles + selects costs more vector ops per row than the loads. The
"(or a Mosaic gather op)" branch of the round-4 kNN/gather candidate is
a measured dead end on this generation.

    python scripts/exp_mosaic_gather_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

def probe(S, L, hi, name):
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=0)
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((S, L), lambda: (0, 0)),
                      pl.BlockSpec((S, L), lambda: (0, 0))],
            out_specs=pl.BlockSpec((S, L), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        )
        rng = np.random.default_rng(0)
        tab = jnp.asarray(rng.normal(size=(S, L)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, hi, (S, L)), jnp.int32)
        out = np.asarray(f(tab, idx))
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        print(f"{name} S={S} L={L} hi={hi}: compiled, correct={np.array_equal(out, want)}", flush=True)
        return f, tab, idx
    except Exception as e:
        print(f"{name} S={S} L={L} hi={hi}: FAILED {type(e).__name__}: {str(e)[:240]}", flush=True)
        return None, None, None

probe(8, 128, 8, "vreg-local")
probe(64, 128, 64, "cross-vreg-64")
f, tab, idx = probe(1024, 128, 1024, "cross-vreg-1024")
probe(7168, 128, 7168, "full-table")

if f is not None:
    # timing: reps inside jit to dodge the tunnel
    @jax.jit
    def many(tab, idx):
        acc = jnp.zeros((), jnp.float32)
        o = None
        for i in range(50):
            # vary indices across reps without ever leaving [0, 1024):
            # idx + 1 can reach the table size, and tpu.dynamic_gather's
            # OOB semantics are unspecified (could time a different path)
            o = f(tab, (idx + (i % 2)) % 1024)
            acc = acc + o[0, 0]
        return acc
    float(many(tab, idx))
    t0 = time.perf_counter()
    r = float(many(tab, idx)); r = float(many(tab, idx))
    dt = (time.perf_counter() - t0) / 2 / 50
    print(f"cross-vreg-1024 per call: {dt*1e6:.1f} us -> {dt/1024*1e9:.2f} ns/row (128 lanes)", flush=True)
