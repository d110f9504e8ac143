"""Measure the Mosaic dot_general's effective operand precision on TPU.

The exact banded kNN kernel showed ~1e-3..8e-3 relative score errors vs
the XLA einsum at production shape — the bf16x1 signature (bf16 operand
truncation is rel ~2^-9; bf16x3/f32 would be ~2^-21). This probes the
very dot the kernel issues — (qt, c_pad) x (band, c_pad) contracting on
dim 1 — inside a minimal pallas_call, against f64 ground truth, with and
without precision=HIGHEST, and the XLA einsum for reference.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(q_ref, x_ref, o_ref, *, precision):
    o_ref[:] = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


@functools.partial(jax.jit, static_argnames=("precision",))
def run(q, x, precision=None):
    return pl.pallas_call(
        functools.partial(kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], x.shape[0]),
                                       jnp.float32),
    )(q, x)


rng = np.random.default_rng(0)
q = rng.uniform(0, 30, (512, 8)).astype(np.float32)
x = rng.uniform(0, 30, (2048, 8)).astype(np.float32)
truth = q.astype(np.float64) @ x.astype(np.float64).T

for name, fn in [
    ("pallas default", lambda: run(jnp.asarray(q), jnp.asarray(x))),
    ("pallas HIGHEST", lambda: run(jnp.asarray(q), jnp.asarray(x),
                                   precision=jax.lax.Precision.HIGHEST)),
    ("xla einsum default", lambda: jnp.einsum(
        "qc,nc->qn", jnp.asarray(q), jnp.asarray(x),
        preferred_element_type=jnp.float32)),
    ("xla einsum HIGHEST", lambda: jnp.einsum(
        "qc,nc->qn", jnp.asarray(q), jnp.asarray(x),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)),
]:
    try:
        got = np.asarray(fn()).astype(np.float64)
        rel = np.abs(got - truth) / np.maximum(np.abs(truth), 1e-30)
        print(f"{name:22s} max rel err {rel.max():.3e}  "
              f"median {np.median(rel):.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:22s} FAILED: {type(e).__name__}: {e}")
