"""Fused-stage tile re-check under the NEW feature-banded default.

The in-VMEM gather inside the fused stage kernels is ~2x faster on
spatially-LOCAL kNN indices (CLAUDE.md round-3 note); feature-banded
stages 2-3 (band=4096 around the x-sorted row order) make the stage-2/3
indices much more local than the full capped kernel's, so the qt/unroll
optimum may have moved from the (128,16) winner measured under capped
indices. Full-forward A/B, rt-once + warm-discard + default re-measured
last to bracket chip drift (the exp_stage_unroll4.py methodology).

    python scripts/exp_stage_tiles_fb.py > /tmp/exp_stage_tiles_fb.log 2>&1
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

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 30.0, (B, N, 3)).astype(np.float32)
    x = np.stack([xi[np.argsort(xi[:, 0], kind="stable")] for xi in x])
    x[..., 2] = rng.uniform(0.0, 5.0, (B, N))
    feat = rng.uniform(0.0, 5.0, (B, N, 1)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([x, feat], axis=-1))

    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped")  # feature band = default
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    orig_stage = ep.edgeconv_fused_stage
    orig_ext = ep.edgeconv_fused_extrema
    ref_box = {}

    def run(qt, u):
        ep.edgeconv_fused_stage = functools.partial(orig_stage, qt=qt,
                                                    unroll=u)
        ep.edgeconv_fused_extrema = functools.partial(orig_ext, qt=qt,
                                                      unroll=u)

        @jax.jit
        def fwd(p, s, xx):
            out, _ = apply_dgcnn(p, s, xx, cfg, train=False)
            return out

        try:
            out = jax.block_until_ready(fwd(params, bn, pts))
        except Exception as e:
            log(f"qt={qt} u={u}: FAILED {type(e).__name__}: "
                f"{str(e)[:140]}")
            ep.edgeconv_fused_stage = orig_stage
            ep.edgeconv_fused_extrema = orig_ext
            return
        if "ref" not in ref_box:
            ref_box["ref"] = np.asarray(out)
        else:
            assert np.array_equal(np.asarray(out), ref_box["ref"]), (qt, u)
        for _ in range(6):
            float(jnp.sum(fwd(params, bn, pts)))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(6):
                float(jnp.sum(fwd(params, bn, pts)))
            trials.append((time.perf_counter() - t0) / 6 - rt)
        med = statistics.median(trials) * 1e3
        log(f"forward qt={qt} u={u}: {med:.2f} ms "
            f"[{min(trials)*1e3:.1f}..{max(trials)*1e3:.1f}] "
            f"= {B*N/(med/1e3)/1e6:,.2f}M pts/s")
        fwd.clear_cache()
        ep.edgeconv_fused_stage = orig_stage
        ep.edgeconv_fused_extrema = orig_ext

    run(128, 16)   # current default
    run(128, 32)
    run(256, 16)
    run(128, 8)
    run(128, 16)   # default again (drift bracket)
    log("DONE")


if __name__ == "__main__":
    main()
