"""Train-step breakdown with the production capped-kNN defaults, plus
train-step batch scaling now that the fori capped kernel keeps programs
small (round 2 mid: B=32 train failed in the remote-compile helper with
the larger approx/unrolled programs).

Run ONCE in a background process:
    python scripts/exp_train_capped_breakdown.py > /tmp/exp_breakdown.log 2>&1
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import measure, roundtrip_seconds

N, K = 7000, 30
IMPL = "pallas_capped"


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    B = 8
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl=IMPL)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (B, N, 4))
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))

    def loss_fn(p, s, xx):
        logits, _ = apply_dgcnn(p, s, xx, cfg, train=True,
                                rng=jax.random.key(3))
        return masked_smoothed_cross_entropy(logits, labels, mask)

    fwd = jax.jit(loss_fn)
    r = measure(fwd, params, state, x, iters=8)
    log(f"train-mode forward (capped): {r['sec_per_call']*1e3:.1f} ms")

    # eval-mode forward for contrast (uses the unrolled kernel)
    def eval_fn(p, s, xx):
        logits, _ = apply_dgcnn(p, s, xx, cfg, train=False)
        return jnp.sum(logits)

    r = measure(jax.jit(eval_fn), params, state, x, iters=8)
    log(f"eval-mode forward (capped): {r['sec_per_call']*1e3:.1f} ms")

    # full grad: pull every leaf so nothing is dead-code eliminated
    def grad_sum(p, s_, xx):
        g = jax.grad(loss_fn)(p, s_, xx)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    r = measure(jax.jit(grad_sum), params, state, x, iters=8)
    log(f"forward+backward (capped): {r['sec_per_call']*1e3:.1f} ms")

    # full train step at several batch sizes
    def step_time(b):
        cfg_b = DGCNNConfig(num_classes=5, num_features=4, k=K,
                            emb_dims=1024, knn_impl=IMPL)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg_b, tx)
        step = make_train_step(cfg_b, tx, donate=True)
        xb = jax.random.normal(jax.random.key(1), (b, N, 4))
        lb = jnp.zeros((b, N), jnp.int32)
        mb = jnp.ones((b, N), jnp.float32)
        t0 = time.perf_counter()
        st, m = step(st, xb, lb, mb)
        _ = float(m["loss"])
        compile_s = time.perf_counter() - t0
        rt = roundtrip_seconds()
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            st, m = step(st, xb, lb, mb)
            _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / iters - rt
        return compile_s, dt * 1e3, b * N / dt

    for b in (8, 16, 32):
        try:
            compile_s, ms, pps = step_time(b)
            log(f"train step B={b}: compile {compile_s:.1f} s, "
                f"{ms:.2f} ms ({pps/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"train step B={b}: FAILED {type(e).__name__}: {str(e)[:200]}")

    log("done")


if __name__ == "__main__":
    main()
