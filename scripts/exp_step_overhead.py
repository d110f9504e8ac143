"""Round-2 experiment 2: dissect the ~39 ms train-step overhead
(fwd+bwd 151 ms vs full step 190 ms) + scatter width cost model +
channel-reduced stage-1 scatter.

Run on TPU: python scripts/exp_step_overhead.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy
from dgcnn_tpu.train.steps import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import measure

B, N, K, C = 8, 7000, 30, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ms(fn, *args, iters=5):
    return measure(fn, *args, iters=iters)["sec_per_call"] * 1e3


def make_step_variant(cfg, tx, *, metrics=True, donate=False):
    import optax

    from dgcnn_tpu.ops.metrics import confusion_matrix

    def loss_fn(params, bn_state, points, labels, mask, rng):
        logits, new_bn = apply_dgcnn(params, bn_state, points, cfg,
                                     train=True, rng=rng)
        loss = masked_smoothed_cross_entropy(logits, labels, mask)
        return loss, (new_bn, logits)

    def step(state, points, labels, mask):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, (new_bn, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.bn_state, points, labels, mask, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if metrics:
            pred = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(pred, labels, cfg.num_classes, weights=mask)
            m = {"loss": loss, "confusion": cm}
        else:
            m = {"loss": loss}
        return TrainState(params=new_params, bn_state=new_bn,
                          opt_state=new_opt, rng=rng,
                          step=state.step + 1), m

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def time_step(step, state, pts, labels, mask, donate):
    """Sync-aware timing that tolerates donated state."""
    import time

    from dgcnn_tpu.utils.profiling import roundtrip_seconds

    st = state
    st, _ = step(st, pts, labels, mask)  # compile
    jax.block_until_ready(st.params)
    rt = roundtrip_seconds()
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, pts, labels, mask)
        _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters - rt
    return dt * 1e3


def main():
    log(f"backend: {jax.default_backend()}")
    pts = jax.random.normal(jax.random.key(1), (B, N, 4))
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))

    # -- scatter width cost model
    M = N * K
    for w in (1, 4, 8, 16, 32, 64):
        dy = jax.random.normal(jax.random.key(3), (B, M, w))
        tgt = jax.random.randint(jax.random.key(4), (B, M), 0, N)

        def sc(d, t):
            out = jnp.zeros((B, N, w), d.dtype)
            return out.at[jnp.arange(B)[:, None], t].add(d)

        log(f"scatter (B,{M},{w}) -> (B,{N},{w}): "
            f"{ms(jax.jit(sc), dy, tgt):7.2f} ms")

    # -- dropout / PRNG cost
    for impl in ("threefry2x32", "rbg"):
        kkey = jax.random.key(7, impl=impl)
        f = jax.jit(lambda k: jax.random.bernoulli(k, 0.5, (B, N, 512)))
        log(f"bernoulli (8,7000,512) {impl}: {ms(f, kkey):7.2f} ms")

    # -- train step variants
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="approx")
    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)

    for name, mk in [
        ("library step donate=True ", lambda: make_train_step(cfg, tx, donate=True)),
        ("library step donate=False", lambda: make_train_step(cfg, tx, donate=False)),
        ("variant no-metrics       ", lambda: make_step_variant(cfg, tx, metrics=False, donate=True)),
    ]:
        state = init_train_state(jax.random.key(0), cfg, tx)
        log(f"{name}: {time_step(mk(), state, pts, labels, mask, True):7.1f} ms")

    cfg0 = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                       knn_impl="approx", dropout=0.0)
    state = init_train_state(jax.random.key(0), cfg0, tx)
    step = make_train_step(cfg0, tx, donate=True)
    log(f"library step dropout=0.0 : "
        f"{time_step(step, state, pts, labels, mask, True):7.1f} ms")

    state = init_train_state(jax.random.key(0, impl='rbg'), cfg, tx)
    step = make_train_step(cfg, tx, donate=True)
    log(f"library step rbg PRNG    : "
        f"{time_step(step, state, pts, labels, mask, True):7.1f} ms")

    # -- fwd+bwd pulling ALL grads (DCE check)
    def loss_fn(p, s, x):
        logits, _ = apply_dgcnn(p, s, x, cfg, train=True,
                                rng=jax.random.key(3))
        return masked_smoothed_cross_entropy(logits, labels, mask)

    state = init_train_state(jax.random.key(0), cfg, tx)
    g_all = jax.jit(lambda p, s_, x: sum(
        jnp.sum(l) for l in jax.tree_util.tree_leaves(
            jax.grad(loss_fn)(p, s_, x))))
    log(f"fwd+bwd (sum ALL grads)  : "
        f"{ms(g_all, state.params, state.bn_state, pts):7.1f} ms")
    g_one = jax.jit(lambda p, s_, x: jax.tree_util.tree_leaves(
        jax.grad(loss_fn)(p, s_, x))[0])
    log(f"fwd+bwd (first grad only): "
        f"{ms(g_one, state.params, state.bn_state, pts):7.1f} ms")

    print("EXP2 DONE")


if __name__ == "__main__":
    main()
