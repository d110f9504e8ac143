#!/usr/bin/env python
"""Round-3 batch-scaling refresh: train (capped kNN + fused VJP chains +
bit dropout) and eval (fused VMEM-gather stages) at B=8/16/32, plus a
retry of the flat B=32 train compile (r2: axon remote-compile HTTP 500).

Run: python scripts/exp_scaling_r3.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_blocks
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    N, K = 7000, 30

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

    # eval scaling with fused stages
    for b in (8, 16, 32):
        cfg = DGCNNConfig(num_classes=5, num_features=4, k=K,
                          emb_dims=1024, knn_impl="pallas_capped")
        params, state = init_dgcnn(jax.random.key(0), cfg)
        x = jnp.asarray(make_blocks(b=b))

        @jax.jit
        def fwd(p, s, x, cfg=cfg):
            return jnp.sum(apply_dgcnn(p, s, x, cfg, train=False)[0])

        try:
            t0 = time.perf_counter()
            float(fwd(params, state, x))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                float(fwd(params, state, x))
            dt = (time.perf_counter() - t0) / iters - rt
            log(f"eval  B={b:2d}: {dt*1e3:7.2f} ms = {b*N/dt:,.0f} pts/s "
                f"(compile {comp:.0f}s)")
        except Exception as e:
            log(f"eval  B={b}: FAILED {type(e).__name__}: {e}")

    # train scaling (grad_accum for the big effective batches, and the
    # flat B=32 retry now that the fused-tail program is smaller)
    for b, accum, unroll in ((8, 1, True), (16, 1, True), (16, 2, True),
                             (32, 1, False), (32, 2, True), (64, 4, True)):
        cfg = DGCNNConfig(num_classes=5, num_features=4, k=K,
                          emb_dims=1024, knn_impl="pallas_capped",
                          knn_train_unroll=unroll)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True, grad_accum=accum)
        pts = jnp.asarray(make_blocks(b=b))
        labels = jax.random.randint(jax.random.key(2), (b, N), 0, 5)
        mask = jnp.ones((b, N))
        try:
            t0 = time.perf_counter()
            st, m = step(st, pts, labels, mask)
            float(m["loss"])
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                st, m = step(st, pts, labels, mask)
                float(m["loss"])
            dt = (time.perf_counter() - t0) / iters - rt
            log(f"train B={b:2d} accum={accum} unroll={int(unroll)}: "
                f"{dt*1e3:7.2f} ms = {b*N/dt:,.0f} pts/s "
                f"(compile {comp:.0f}s)")
        except Exception as e:
            log(f"train B={b} accum={accum}: FAILED "
                f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
