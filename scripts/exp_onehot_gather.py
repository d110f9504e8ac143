"""Measure the one-hot MXU gather's cost components on the real chip
(VERDICT item 6: tile-local dedup gather vs the dynamic row-load floor).

Span statistics (exp_span_stats.py, bench workload):
  stage-1 |idx-q| p50=165, but W=1024 windows are needed for 96.4% row
  coverage (per-tile spans are outlier-inflated to p50=1265).
A hybrid kernel would: load the W-row window contiguously, build a
(qt*k, W) one-hot in bf16, MXU-matmul it against the window, and resolve
the ~4% stragglers dynamically. This measures the two dominant new costs
in isolation at the production tile shape (qt=128, k=30, W=1024, C=64):
  (a) one-hot construction: broadcasted-iota compare -> bf16 store,
  (b) the (3840, W) @ (W, 64) matmul at bf16x1 (lossy gather) and with
      an f32-exact 3-term bf16 split of the value operand (x3).
Per-stage totals are these times x nq (55 tiles/batch-row) x B (8) vs
the fused stage kernel's ~5.8 ms/stage total (~3.5-4 ms of it gather).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT, K, W, C = 128, 30, 1024, 64
ROWS = QT * K


def onehot_kernel(li_ref, xs_ref, o_ref, *, passes):
    li = li_ref[0]                                   # (1, ROWS) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    oh = (li.reshape(ROWS, 1) == iota).astype(jnp.bfloat16)
    xs = xs_ref[:]                                   # (W, C) f32
    if passes == 1:
        acc = jax.lax.dot_general(
            oh, xs.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        # exact 3-term bf16 split of the VALUE operand (one-hot is exact
        # in bf16 already): v = hi + mid + lo
        hi = xs.astype(jnp.bfloat16)
        r1 = xs - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.zeros((ROWS, C), jnp.float32)
        for term in (hi, mid, lo):
            acc = acc + jax.lax.dot_general(
                oh, term,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc


def maskonly_kernel(li_ref, xs_ref, o_ref):
    # isolates one-hot construction: build + one reduce, no matmul
    li = li_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    oh = (li.reshape(ROWS, 1) == iota).astype(jnp.bfloat16)
    o_ref[:] = jnp.broadcast_to(
        jnp.sum(oh, axis=1, keepdims=True).astype(jnp.float32), (ROWS, C))


@functools.partial(jax.jit, static_argnames=("mode",))
def run_reps(li, xs, mode="x1", reps=20):
    if mode == "mask":
        kern = maskonly_kernel
    else:
        kern = functools.partial(onehot_kernel,
                                 passes=1 if mode == "x1" else 3)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, C), jnp.float32),
    )
    acc = jnp.float32(0)
    for i in range(reps):
        acc = acc + call(li + (i % 2), xs)[0, 0]
    return acc


rng = np.random.default_rng(0)
li = jnp.asarray(rng.integers(0, W - 2, (1, ROWS)).astype(np.int32))
xs = jnp.asarray(rng.normal(size=(W, C)).astype(np.float32))

NQ_TOTAL = 55 * 8   # tiles per stage per batch (N=7000/qt=128 x B=8)
for mode in ("mask", "x1", "x3"):
    float(run_reps(li, xs, mode=mode))            # compile + warm
    t0 = time.perf_counter()
    float(run_reps(li, xs, mode=mode))
    dt = (time.perf_counter() - t0) / 20
    print(f"{mode:4s}: {dt*1e6:8.1f} us/tile -> "
          f"{dt * NQ_TOTAL * 1e3:6.2f} ms/stage-equivalent")
