"""Full-forward A/B guard for the precise-sweep stage-tile retune.

Standalone reps-in-jit (exp_stage_sweep_precise.py) found stage 64/32
(5.49 vs 5.78 default) and extrema 128/32 (5.18 vs 5.42) — ~0.8 ms on
the forward. This interleaved full-forward A/B guards against in-model
co-residency regressions before flipping defaults for good: OLD arm is
env-forced 128/16 (the previous default for both kernels), NEW arm is
the new per-kernel defaults.

    python scripts/exp_stage_tiles_ab.py > /tmp/exp_stage_tiles_ab.log 2>&1
"""

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

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    arms = {}
    for name, env, salt in (("old 128/16", ("128", "16"), 0),
                            ("new 64|128/32", None, 1)):
        if env:
            os.environ["DGCNN_STAGE_QT"] = env[0]
            os.environ["DGCNN_STAGE_UNROLL"] = env[1]
        else:
            os.environ.pop("DGCNN_STAGE_QT", None)
            os.environ.pop("DGCNN_STAGE_UNROLL", None)
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_query_chunk=1024 + salt)
        params, bn = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, s, xx, cfg=cfg):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

        float(fwd(params, bn, pts))
        arms[name] = (fwd, params, bn, [])
        os.environ.pop("DGCNN_STAGE_QT", None)
        os.environ.pop("DGCNN_STAGE_UNROLL", None)

    for _ in range(2):  # warm both
        for fwd, params, bn, _ in arms.values():
            for _ in range(3):
                float(fwd(params, bn, pts))
    for t in range(7):  # interleaved trials
        for name, (fwd, params, bn, ts) in arms.items():
            t0 = time.perf_counter()
            for _ in range(6):
                float(fwd(params, bn, pts))
            ts.append((time.perf_counter() - t0) / 6 - rt)
    for name, (_, _, _, ts) in arms.items():
        med = statistics.median(ts) * 1e3
        log(f"{name}: {med:.2f} ms [{min(ts)*1e3:.2f}..{max(ts)*1e3:.2f}] "
            f"= {B*N/(med/1e3)/1e6:.2f}M pts/s")
    log("DONE")


if __name__ == "__main__":
    main()
