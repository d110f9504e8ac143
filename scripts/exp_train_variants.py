#!/usr/bin/env python
"""Experiment: train-step variants toward the <=70 ms target (VERDICT r3 #2).

Measures the full jitted train step (B=8, N=7000, k=30, capped kNN) under:
  * gather = xla | pallas   (DGCNN_GATHER_IMPL — forward neighbour gather)
  * knn unroll = fori | unrolled (knn_train_unroll; unrolled pays a one-time
    ~10 min Mosaic compile, amortised by the persistent cache)

Usage: python scripts/exp_train_variants.py [--iters 15] [--skip-unroll]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--skip-unroll", action="store_true")
    args = ap.parse_args()

    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import make_blocks
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    B, N, K, F, C, EMB = 8, 7000, 30, 4, 5, 1024
    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))

    @jax.jit
    def triv(a):
        return jnp.sum(a)

    a = jnp.ones((8, 128))
    float(triv(a))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(a))
    rt = (time.perf_counter() - t0) / 10
    log(f"round-trip {rt*1e3:.1f} ms")

    variants = [
        ("xla-gather fori plain-tail", "xla", False, False),
        ("xla-gather fori fused-tail", "xla", False, True),
        ("pallas-gather fori fused-tail", "pallas", False, True),
        ("pallas-gather fori plain-tail", "pallas", False, False),
    ]
    if not args.skip_unroll:
        variants += [
            ("xla-gather unrolled fused-tail", "xla", True, True),
        ]
    if os.environ.get("DGCNN_EXP_ONLY_UNROLL"):
        variants = [v for v in variants if "unrolled" in v[0]]

    for name, gimpl, unroll, fused_tail in variants:
        os.environ["DGCNN_GATHER_IMPL"] = gimpl
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                          knn_impl="pallas_capped",
                          knn_train_unroll=unroll,
                          stage_tail_fused=fused_tail)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        state = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        state, m = step(state, pts, labels, mask)
        l0 = float(m["loss"])
        compile_s = time.perf_counter() - t0
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = step(state, pts, labels, mask)
                float(m["loss"])
            trials.append((time.perf_counter() - t0) / args.iters - rt)
        med = sorted(trials)[1]
        log(f"{name:24s}: {med*1e3:7.2f} ms/step "
            f"[{min(trials)*1e3:.1f}..{max(trials)*1e3:.1f}] "
            f"(compile {compile_s:.0f}s, loss {l0:.4f}) "
            f"= {B*N/med:,.0f} pts/s")


if __name__ == "__main__":
    main()
