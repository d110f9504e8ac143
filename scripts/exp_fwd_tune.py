"""In-model forward tuning sweep, round-3 late. All timings are full
bench-style forwards (the only reliable methodology on the tunnelled
chip — see exp_stage_unroll{2,3,4}.py): rt once, warm discarded,
median-of-5x6, baseline re-measured at the end to bracket drift.

Axes:
  1. fused-stage (qt, unroll): current default (128,16) vs (256,16),
     (128,32) — bit-exact, pure timing choice.
  2. capped kNN query tile (stages 2-3): table 384 vs 512 via
     DGCNN_KNN_QUERY_TILE — bit-exact, pure timing.
  3. knn_band: 2048 (default) vs 1024 — CHANGES stage-1 neighbour sets
     (certified exact-or-repaired); reports argmax agreement vs default.

Run ONCE: python scripts/exp_fwd_tune.py > /tmp/exp_fwd_tune.log 2>&1
"""

import functools
import os
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

float(jnp.sum(jnp.ones(())))
t0 = time.perf_counter()
for _ in range(20):
    float(jnp.sum(jnp.ones(())))
RT = (time.perf_counter() - t0) / 20
log(f"rt: {RT*1e3:.1f} ms")

ORIG_STAGE = ep.edgeconv_fused_stage
ORIG_EXT = ep.edgeconv_fused_extrema
base_out = None


def run(tag, *, band=2048, stage_qt=None, stage_u=None, knn_qt=None,
        exact_expected=True):
    global base_out
    if knn_qt is None:
        os.environ.pop("DGCNN_KNN_QUERY_TILE", None)
    else:
        os.environ["DGCNN_KNN_QUERY_TILE"] = str(knn_qt)
    if stage_qt is None:
        ep.edgeconv_fused_stage = ORIG_STAGE
        ep.edgeconv_fused_extrema = ORIG_EXT
    else:
        ep.edgeconv_fused_stage = functools.partial(
            ORIG_STAGE, qt=stage_qt, unroll=stage_u)
        ep.edgeconv_fused_extrema = functools.partial(
            ORIG_EXT, qt=stage_qt, unroll=stage_u)
    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped", knn_band=band)
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    @jax.jit
    def fwd(p, s, xx):
        out, _ = apply_dgcnn(p, s, xx, cfg, train=False)
        return out

    out = np.asarray(jax.block_until_ready(fwd(params, bn, pts)))
    note = ""
    if base_out is None:
        base_out = out
    elif exact_expected:
        assert np.array_equal(out, base_out), tag
        note = " bit-exact"
    else:
        agree = float(
            (out.argmax(-1) == base_out.argmax(-1)).mean())
        note = f" argmax agree {agree:.6f}"
    for _ in range(6):
        float(jnp.sum(fwd(params, bn, pts)))
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(6):
            float(jnp.sum(fwd(params, bn, pts)))
        trials.append((time.perf_counter() - t0) / 6 - RT)
    med = statistics.median(trials) * 1e3
    log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.1f}..{max(trials)*1e3:.1f}]"
        f" = {B*N/(med/1e3)/1e6:,.2f}M pts/s{note}")
    fwd.clear_cache()


run("baseline (band2048, knnqt=table384, stage 128/16)")
run("knn_qt 512", knn_qt=512)
run("stage 256/16", stage_qt=256, stage_u=16)
run("stage 128/32", stage_qt=128, stage_u=32)
run("band 1024", band=1024, exact_expected=False)
run("baseline again (drift check)")
log("DONE")
