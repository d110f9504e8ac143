"""In-model attribution of the eval forward: where do the ~26 ms go?

exp_knn_floor.py measured the banded KERNELS at ~1-2 ms/call steady-state
(reps-in-jit) — far below the ~6 ms/stage the forward's cost was being
attributed to. This script settles the true in-model split three ways:

1. wrapper-vs-kernel reps-in-jit: `_knn_banded_jit` (kernel only) vs
   `knn_pallas_banded` (cert + UNCONDITIONAL repair glue) vs
   `knn_pallas_feature_banded` (thin cond) — isolates the glue cost.
2. full-forward A/B with each kNN call replaced by PRECOMPUTED constant
   indices (captured from an eager run on the same inputs) — the delta
   IS that call's in-model cost, gathers/stages untouched (indices are
   the real, spatially-local ones, so the fused-stage gather speed is
   unchanged).
3. warm-state re-run of the kernel phase ablations (exp_knn_floor's first
   config ran cold on a fresh claim — its numbers were polluted).

    python scripts/exp_knn_floor2.py > /tmp/exp_knn_floor2.log 2>&1
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
from dgcnn_tpu.kernels.knn_pallas import (
    _knn_banded_jit,
    knn_pallas_banded,
    knn_pallas_feature_banded,
)
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn


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

    # ---- model + input
    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped")
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    # warm the device thoroughly before ANY timing (floor1's first block
    # ran on a fresh claim and read 5-10x high)
    @jax.jit
    def fwd_warm(p, s, xx):
        return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

    float(fwd_warm(params, bn, pts))
    for _ in range(8):
        float(fwd_warm(params, bn, pts))

    # ---- (1) wrapper vs kernel, reps-in-jit
    REPS = 16

    def timed_reps(fn, x):
        @jax.jit
        def many(x0):
            def body(i, carry):
                x_, acc = carry
                idx = fn(x_)
                s = jnp.sum(idx[:, ::131, 0].astype(jnp.float32)) * 1e-30
                return (x_ + s, acc + s)

            return jax.lax.fori_loop(0, REPS, body, (x0, jnp.float32(0)))[1]

        float(many(x))
        float(many(x))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(x))
            trials.append((time.perf_counter() - t0 - rt) / REPS)
        return statistics.median(trials) * 1e3, min(trials) * 1e3, \
            max(trials) * 1e3

    x64 = jnp.asarray(
        np.take_along_axis(
            (a := np.random.default_rng(0).random((B, N, 64)).astype(
                np.float32) * 4),
            np.argsort(a[..., 0], axis=1, kind="stable")[..., None], axis=1)
    )
    true_flag = jnp.asarray(True)
    cases = [
        ("s1 kernel-only (_knn_banded_jit b=2048 qt=512)",
         lambda x: _knn_banded_jit(x, K, band=2048, n_win=32, cap=8,
                                   query_tile=512)[0], pts),
        ("s1 wrapper (knn_pallas_banded: cert+repair)",
         lambda x: knn_pallas_banded(x, K, band=2048), pts),
        ("fb kernel-only (_knn_banded_jit b=4096 qt=384)",
         lambda x: _knn_banded_jit(x, K, band=4096, n_win=32, cap=8,
                                   query_tile=384)[0], x64),
        ("fb wrapper (knn_pallas_feature_banded)",
         lambda x: knn_pallas_feature_banded(x, K, sorted_ok=true_flag),
         x64),
    ]
    log("--- wrapper vs kernel (reps-in-jit) ---")
    for name, fn, x in cases:
        med, lo, hi = timed_reps(fn, x)
        log(f"{name}: {med:.2f} ms [{lo:.2f}..{hi:.2f}]")

    # ---- (2) in-model kNN ablation via precomputed-index replay
    # capture: return the traced _knn outputs from a jit (an eager run
    # would dispatch op-by-op over the ~25 ms tunnel — minutes)
    traced = []

    def capture(x, cfg_, **kw):
        out = ORIG_KNN(x, cfg_, **kw)
        traced.append(out)
        return out

    dg._knn = capture

    @jax.jit
    def run_capture(p, s, xx):
        traced.clear()
        logits = apply_dgcnn(p, s, xx, cfg, train=False)[0]
        return logits, tuple(traced)

    _, captured = run_capture(params, bn, pts)
    dg._knn = ORIG_KNN
    stash = [np.asarray(c) for c in captured]
    assert len(stash) == 3, len(stash)
    log(f"captured {len(stash)} kNN outputs "
        f"{[s.shape for s in stash]}")

    def fwd_time(replay_mask, tag, salt):
        """replay_mask[i]=True -> stage i+1's kNN is a constant replay."""
        calls = {"n": 0}

        def patched(x, cfg_, **kw):
            i = calls["n"]
            calls["n"] += 1
            if replay_mask[i % 3]:
                return jnp.asarray(stash[i % 3])
            return ORIG_KNN(x, cfg_, **kw)

        dg._knn = patched
        cfg_v = DGCNNConfig(num_classes=C, num_features=F, k=K,
                            emb_dims=EMB, knn_impl="pallas_capped",
                            knn_query_chunk=1024 + salt)

        @jax.jit
        def fwd(p, s, xx):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg_v, train=False)[0])

        float(fwd(params, bn, pts))
        for _ in range(6):
            float(fwd(params, bn, pts))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(6):
                float(fwd(params, bn, pts))
            trials.append((time.perf_counter() - t0) / 6 - rt)
        med = statistics.median(trials) * 1e3
        log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.2f}.."
            f"{max(trials)*1e3:.2f}]")
        fwd.clear_cache()
        dg._knn = ORIG_KNN
        return med

    log("--- in-model kNN ablation (full forward A/B) ---")
    a0 = fwd_time((False, False, False), "anchor (all kNN live)", 0)
    nk = fwd_time((True, True, True), "all 3 kNN replayed", 1)
    ns1 = fwd_time((True, False, False), "s1 replayed", 2)
    nfb = fwd_time((False, True, True), "fb (s2+s3) replayed", 3)
    a1 = fwd_time((False, False, False), "anchor again (drift)", 4)
    log(f"=> total in-model kNN: {a0 - nk:.2f} ms | s1: {a0 - ns1:.2f} | "
        f"fb both: {a0 - nfb:.2f} | anchors {a0:.2f}/{a1:.2f}")

    # ---- (3) warm-state kernel phase ablations (fb config)
    log("--- fb kernel phase ablations (warm) ---")
    for study in (None, "no_extract", "score_only", "no_mm", "bf16_mm",
                  None):
        def fn(x, study=study):
            return _knn_banded_jit(x, K, band=4096, n_win=32, cap=8,
                                   query_tile=384, study=study)[0]

        med, lo, hi = timed_reps(fn, x64)
        log(f"{study or 'FULL':>11}: {med:6.2f} ms [{lo:.2f}..{hi:.2f}]")

    log("DONE")


if __name__ == "__main__":
    main()
