"""Clean full-forward A/B: default (64,8) vs (128,16) fused-stage tiles.
Fixes exp_stage_unroll3's rt glitch: rt measured once up front, a
discarded warm trial per variant, and the default variant measured twice
(first + last) to bracket chip drift.

Run ONCE: python scripts/exp_stage_unroll4.py > /tmp/exp_stage_unroll4.log 2>&1
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

float(jnp.sum(jnp.ones(())))  # device up
t0 = time.perf_counter()
for _ in range(20):
    float(jnp.sum(jnp.ones(())))
RT = (time.perf_counter() - t0) / 20
log(f"rt: {RT*1e3:.1f} ms")

ORIG_STAGE = ep.edgeconv_fused_stage
ORIG_EXT = ep.edgeconv_fused_extrema
ref_out = None


def run(qt, u):
    global ref_out
    ep.edgeconv_fused_stage = functools.partial(ORIG_STAGE, qt=qt, unroll=u)
    ep.edgeconv_fused_extrema = functools.partial(ORIG_EXT, qt=qt, unroll=u)

    @jax.jit
    def fwd(p, s, xx):
        out, _ = apply_dgcnn(p, s, xx, cfg, train=False)
        return out

    out = jax.block_until_ready(fwd(params, bn, pts))   # compile
    if ref_out is None:
        ref_out = np.asarray(out)
    else:
        assert np.array_equal(np.asarray(out), ref_out), (qt, u)
    for _ in range(6):                                  # warm, discarded
        float(jnp.sum(fwd(params, bn, pts)))
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(6):
            float(jnp.sum(fwd(params, bn, pts)))
        trials.append((time.perf_counter() - t0) / 6 - RT)
    med = statistics.median(trials) * 1e3
    log(f"forward qt={qt} u={u}: {med:.2f} ms "
        f"[{min(trials)*1e3:.1f}..{max(trials)*1e3:.1f}] "
        f"= {B*N/(med/1e3)/1e6:,.2f}M pts/s")
    fwd.clear_cache()


run(64, 8)
run(128, 16)
run(64, 8)
ep.edgeconv_fused_stage = ORIG_STAGE
ep.edgeconv_fused_extrema = ORIG_EXT
log("DONE")
