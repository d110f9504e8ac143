#!/usr/bin/env python
"""Forward/backward split of the train step with the round-3 defaults
(fused stage tail, capped kNN) — sizes the remaining backward budget for
the <=70 ms target.

Run: python scripts/exp_fwd_bwd_split.py
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
    from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    B, N, K = 8, 7000, 30
    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
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

    def timeit(f, iters=12):
        float(f())
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f())
            trials.append((time.perf_counter() - t0) / iters - rt)
        return sorted(trials)[1]

    for tail in (True, False):
        cfg = DGCNNConfig(num_classes=5, num_features=4, k=K,
                          emb_dims=1024, knn_impl="pallas_capped",
                          stage_tail_fused=tail)
        params, state = init_dgcnn(jax.random.key(0), cfg)

        def loss_fn(p, s, x):
            logits, _ = apply_dgcnn(p, s, x, cfg, train=True,
                                    rng=jax.random.key(3))
            return masked_smoothed_cross_entropy(logits, labels, mask)

        fwd = jax.jit(loss_fn)

        @jax.jit
        def grad(p, s, x):
            # consume the grads in the output — returning the loss alone
            # lets XLA dead-code-eliminate the entire backward
            l, g = jax.value_and_grad(loss_fn)(p, s, x)
            return l + 1e-30 * sum(jnp.sum(t) for t in
                                   jax.tree_util.tree_leaves(g))
        t_f = timeit(lambda: fwd(params, state, pts))
        t_g = timeit(lambda: grad(params, state, pts))
        log(f"tail_fused={tail}: train-fwd {t_f*1e3:6.2f} ms | "
            f"fwd+bwd {t_g*1e3:6.2f} ms | bwd {(t_g-t_f)*1e3:6.2f} ms")

    # eval forward for reference (fused stages)
    cfg_e = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                        knn_impl="pallas_capped")
    params, state = init_dgcnn(jax.random.key(0), cfg_e)
    ev = jax.jit(lambda p, s, x: jnp.sum(
        apply_dgcnn(p, s, x, cfg_e, train=False)[0]))
    t_e = timeit(lambda: ev(params, state, pts))
    log(f"eval fwd (fused stages): {t_e*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
