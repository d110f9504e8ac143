"""Verify the qt=128/u=16 fused-stage result with REPS-INSIDE-JIT timing
(serial data dependence; immune to the ~25 ms tunnel round-trip that
makes sub-ms per-call timings unreliable). Also re-times the kernel at
the current default (qt=64, u=8) and the full forward A/B.

Run ONCE in a background process:
    python scripts/exp_stage_unroll2.py > /tmp/exp_stage_unroll2.log 2>&1
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

from dgcnn_tpu.kernels.edgeconv_pallas import edgeconv_fused_stage


def log(*a):
    print(*a, flush=True)


log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

B, N, K, C, C2 = 8, 7000, 30, 64, 64
REPS = 20
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
bvec = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((C, C2)) * 0.1, jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
sa = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
ta = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
sb = jnp.asarray(rng.standard_normal(C2) * 0.1 + 1, jnp.float32)
tb = jnp.asarray(rng.standard_normal(C2) * 0.1, jnp.float32)


def reps_ms(qt, u, iters=3):
    @jax.jit
    def many(t0):
        def body(carry, _):
            out = edgeconv_fused_stage(
                carry, idx, bvec, w2, sa, ta, sb, tb, qt=qt, unroll=u)
            # serial dependence; tiny perturbation keeps values stable
            return carry + out * jnp.float32(1e-12), None

        t, _ = jax.lax.scan(body, t0, None, length=REPS)
        return jnp.sum(t)

    r = float(many(table))  # compile + warm
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        float(many(table))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3, r


for qt, u in ((64, 8), (64, 16), (128, 8), (128, 16), (128, 30)):
    if (qt * K) % u:
        continue
    ms, _ = reps_ms(qt, u)
    log(f"qt={qt} u={u}: {ms:.2f} ms/stage (reps-in-jit)")

log("DONE")
