"""Full-forward A/B of fused-stage (qt, unroll): default (64,8) vs the
reps-in-jit winners (128,16) and (128,30). Bench-style timing
(rt-subtracted, median of 5 trials x 6 iters) on the production shape —
the end-to-end number is robust where sub-ms per-kernel timings through
the ~25 ms tunnel round-trip are not (exp_stage_unroll.py's 0.58 ms
artifact vs exp_stage_unroll2.py's 7.3 ms reps-in-jit truth).

Run ONCE in a background process:
    python scripts/exp_stage_unroll3.py > /tmp/exp_stage_unroll3.log 2>&1
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

import dgcnn_tpu.kernels.edgeconv_pallas as ep
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn


def log(*a):
    print(*a, flush=True)


log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
rng = np.random.default_rng(0)
x = rng.uniform(0.0, 30.0, (B, N, 3)).astype(np.float32)
x = np.stack([xi[np.argsort(xi[:, 0], kind="stable")] for xi in x])
x[..., 2] = rng.uniform(0.0, 5.0, (B, N))
feat = rng.uniform(0.0, 5.0, (B, N, 1)).astype(np.float32)
pts = jnp.asarray(np.concatenate([x, feat], axis=-1))

cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                  knn_impl="pallas_capped")
params, bn = init_dgcnn(jax.random.key(0), cfg)


def rt_s():
    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(jnp.ones(())))
    return (time.perf_counter() - t0) / 10


ORIG_STAGE = ep.edgeconv_fused_stage
ORIG_EXT = ep.edgeconv_fused_extrema
ref_out = None
for qt, u in ((64, 8), (128, 16), (128, 30)):
    ep.edgeconv_fused_stage = functools.partial(ORIG_STAGE, qt=qt, unroll=u)
    ep.edgeconv_fused_extrema = functools.partial(ORIG_EXT, qt=qt, unroll=u)

    @jax.jit
    def fwd(p, s, xx):
        out, _ = apply_dgcnn(p, s, xx, cfg, train=False)
        return out

    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(params, bn, pts))
    compile_s = time.perf_counter() - t0
    if ref_out is None:
        ref_out = np.asarray(out)
    else:
        assert np.array_equal(np.asarray(out), ref_out), (qt, u)
    rt = rt_s()
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(6):
            float(jnp.sum(fwd(params, bn, pts)))
        trials.append((time.perf_counter() - t0) / 6 - rt)
    med = statistics.median(trials) * 1e3
    log(f"forward qt={qt} u={u}: {med:.2f} ms "
        f"[{min(trials)*1e3:.1f}..{max(trials)*1e3:.1f}] "
        f"= {B*N/(med/1e3)/1e6:,.2f}M pts/s (bit-exact ok, compile {compile_s:.0f}s)")
    # clear the jit cache entry so the next variant recompiles cleanly
    fwd.clear_cache()

ep.edgeconv_fused_stage = ORIG_STAGE
ep.edgeconv_fused_extrema = ORIG_EXT
log("DONE")
