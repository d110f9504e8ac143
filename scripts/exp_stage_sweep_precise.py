"""Precise (reps-in-jit) tile sweep of the fused eval stage kernels.

The corrected attribution (exp_knn_floor3.py) puts the three fused stage
kernels at 17.1 ms of the ~26 ms forward — the dominant block. Their
qt/unroll tiles were chosen by FULL-FORWARD A/B (drift ±1.5 ms), which
cannot resolve 5-10% kernel-level wins. This sweeps qt x unroll on the
standalone kernels with REAL spatially-local indices and the
reps-in-jit method (sensitivity ~0.05 ms), then sanity-checks any
winner with a full-forward A/B.

    python scripts/exp_stage_sweep_precise.py > /tmp/exp_stage_sweep.log 2>&1
"""

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

import dgcnn_tpu.models.dgcnn as dg
from dgcnn_tpu.kernels.edgeconv_pallas import (
    edgeconv_fused_extrema,
    edgeconv_fused_stage,
)
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn
REPS = 16


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

    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped")
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    @jax.jit
    def fwd_warm(p, s, xx):
        return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

    float(fwd_warm(params, bn, pts))
    for _ in range(8):
        float(fwd_warm(params, bn, pts))

    traced = []

    def capture(x, cfg_, **kw):
        out = ORIG_KNN(x, cfg_, **kw)
        traced.append(out)
        return out

    dg._knn = capture

    @jax.jit
    def run_capture(p, s, xx):
        traced.clear()
        lg = apply_dgcnn(p, s, xx, cfg, train=False)[0]
        return lg, tuple(traced)

    _, captured = run_capture(params, bn, pts)
    dg._knn = ORIG_KNN
    stash = [np.asarray(c) for c in captured]

    def timed_many(make_call, *arrays):
        @jax.jit
        def many(*xs):
            def body(i, carry):
                drift, acc = carry
                out = make_call(*[x + drift for x in xs])
                s = jnp.sum(out[:, ::131, 0]) * 1e-30
                return (drift + s, acc + s)

            return jax.lax.fori_loop(
                0, REPS, body, (jnp.float32(0), jnp.float32(0)))[1]

        float(many(*arrays))
        float(many(*arrays))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(*arrays))
            trials.append((time.perf_counter() - t0 - rt) / REPS)
        return statistics.median(trials) * 1e3, min(trials) * 1e3, \
            max(trials) * 1e3

    rng = np.random.default_rng(1)

    def rnd(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    table = rnd(B, N, 64)
    bvec = rnd(B, N, 64)
    w2 = rnd(64, 64)
    sa, ta, sb, tb = rnd(64), rnd(64), rnd(64), rnd(64)
    gamma = rnd(64)
    idx2 = jnp.asarray(stash[1])
    idx3 = jnp.asarray(stash[2])

    log("--- edgeconv_fused_stage sweep (REAL stage-2 indices) ---")
    results = {}
    for qt in (64, 128, 256, 384):
        for u in (8, 16, 24, 32):
            med, lo, hi = timed_many(
                lambda t, b_, qt=qt, u=u: edgeconv_fused_stage(
                    t, idx2, b_, w2, sa, ta, sb, tb, qt=qt, unroll=u),
                table, bvec)
            results[(qt, u)] = med
            log(f"qt={qt:<4} u={u:<3}: {med:6.2f} ms [{lo:.2f}..{hi:.2f}]")
    best = min(results, key=results.get)
    log(f"stage best: qt={best[0]} u={best[1]} {results[best]:.2f} ms "
        f"(default 128/16: {results[(128, 16)]:.2f})")

    log("--- edgeconv_fused_extrema sweep (REAL stage-3 indices) ---")
    results3 = {}
    for qt in (64, 128, 256, 384):
        for u in (8, 16, 32):
            med, lo, hi = timed_many(
                lambda t, b_, qt=qt, u=u: edgeconv_fused_extrema(
                    t, idx3, b_, gamma, sa, ta, qt=qt, unroll=u),
                table, bvec)
            results3[(qt, u)] = med
            log(f"qt={qt:<4} u={u:<3}: {med:6.2f} ms [{lo:.2f}..{hi:.2f}]")
    best3 = min(results3, key=results3.get)
    log(f"extrema best: qt={best3[0]} u={best3[1]} {results3[best3]:.2f} ms "
        f"(default 128/16: {results3[(128, 16)]:.2f})")
    log("DONE")


if __name__ == "__main__":
    main()
