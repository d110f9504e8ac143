"""Probe: can Mosaic lower an in-kernel 2D transpose (and is the
query-major in-kernel dot bitwise-identical to the XLA reference einsum)?

Decides the f32-exact banded kNN design (round 4): the exact kernel must
rank scores computed in the REFERENCE orientation (2 q.c - |c|^2 via
einsum 'qc,nc->qn', ops/knn.py:46-51) or near-tie orderings diverge by
1 ulp from lax.top_k (measured on CPU: 1/25600 queries at N=1600).
Plan A transposes the int32 keys inside the kernel to reach the
windowed-extraction layout; this probe checks Mosaic support + cost.

Run ON TPU:  python scripts/exp_transpose_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tp_kernel(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def transpose_pallas(x, interpret=False):
    m, n = x.shape
    return pl.pallas_call(
        _tp_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
        interpret=interpret,
    )(x)


def _dot_kernel(q_ref, x_ref, o_ref, *, qmajor):
    q, x = q_ref[:], x_ref[:]
    if qmajor:
        o_ref[:] = jax.lax.dot_general(
            q, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        o_ref[:] = jax.lax.dot_general(
            x, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("qmajor",))
def dot_pallas(q, x, qmajor=True):
    qt, c = q.shape
    n = x.shape[0]
    out_shape = (qt, n) if qmajor else (n, qt)
    return pl.pallas_call(
        functools.partial(_dot_kernel, qmajor=qmajor),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(q, x)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # --- transpose lowering probe, production-ish tile shapes
    for shape, dtype in (((128, 2048), jnp.int32), ((512, 2048), jnp.int32),
                         ((256, 7168), jnp.int32), ((512, 4096), jnp.float32)):
        x = jnp.asarray(rng.integers(-2**30, 2**30, shape), dtype=dtype) \
            if dtype == jnp.int32 else \
            jnp.asarray(rng.standard_normal(shape), dtype=dtype)
        try:
            out = transpose_pallas(x)
            ok = bool(jnp.all(out == x.T))
            # crude timing, reps in jit
            f = jax.jit(lambda x: transpose_pallas(transpose_pallas(x)))
            f(x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(x)
            float(jnp.sum(r))
            dt = (time.perf_counter() - t0) / 100
            print(f"transpose {shape} {np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name}: "
                  f"lowered={True} bitexact={ok} {dt*1e3:.3f} ms/transpose")
        except Exception as e:
            print(f"transpose {shape}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # --- dot orientation bitwise probe vs XLA einsum
    for c in (8, 64):
        q = jnp.asarray(rng.standard_normal((512, c)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2048, c)), jnp.float32)
        ref = jnp.einsum("qc,nc->qn", q, x,
                         preferred_element_type=jnp.float32)
        try:
            km = dot_pallas(q, x, qmajor=True)
            same_q = int(jnp.sum(km != ref))
            kt = dot_pallas(q, x, qmajor=False)
            same_t = int(jnp.sum(kt.T != ref))
            print(f"dot c={c}: qmajor mismatches {same_q}/{ref.size}, "
                  f"transposed-orientation mismatches {same_t}/{ref.size}")
        except Exception as e:
            print(f"dot c={c}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
