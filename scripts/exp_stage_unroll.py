"""Round-3: unroll x qt sweep for the fused eval stage kernel.

The in-kernel gather (~3 of the 4.6-5.5 ms/stage) is issue-latency bound:
u=8 measured ~2.3x u=1. qt*k = qt*30 rows divide cleanly by 15/16/30/32
for qt in (64, 128), so deeper unrolls are available but unmeasured.

Run ONCE in a background process:
    python scripts/exp_stage_unroll.py > /tmp/exp_stage_unroll.log 2>&1
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
from dgcnn_tpu.utils.profiling import measure


def log(*a):
    print(*a, flush=True)


log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

B, N, K, C, C2 = 8, 7000, 30, 64, 64
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
bvec = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((C, C2)) * 0.1, jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
sa = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
ta = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
sb = jnp.asarray(rng.standard_normal(C2) * 0.1 + 1, jnp.float32)
tb = jnp.asarray(rng.standard_normal(C2) * 0.1, jnp.float32)

ref = None
best = (1e9, None)
for qt in (64, 128):
    for u in (8, 15, 16, 30, 32):
        if (qt * K) % u:
            continue
        fn = functools.partial(edgeconv_fused_stage, qt=qt, unroll=u)
        try:
            out = jax.block_until_ready(
                fn(table, idx, bvec, w2, sa, ta, sb, tb))
        except Exception as e:
            log(f"qt={qt} u={u}: FAILED {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref = np.asarray(out)
        else:
            assert np.array_equal(np.asarray(out), ref), (qt, u)
        m = measure(fn, table, idx, bvec, w2, sa, ta, sb, tb, iters=6)
        ms = m["sec_per_call"] * 1e3
        log(f"qt={qt} u={u}: {ms:.2f} ms/stage (bit-exact ok)")
        if ms < best[0]:
            best = (ms, (qt, u))
log(f"best: qt={best[1][0]} u={best[1][1]} at {best[0]:.2f} ms")
log("DONE")
