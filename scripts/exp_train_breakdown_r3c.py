"""Train-step breakdown at the round-3-continued baseline (~63.5 ms:
banded kNN + fused stage tails + stage-3 in-kernel-cotangent scatter +
scatter unroll=4). Ablates the remaining cost centres to bound what a
round-4 attack could recover:

  - full step vs fwd+bwd vs fwd-only  -> optimizer + backward split
  - stage-3 tail kernel vs stock      -> re-confirm the landed win
  - dropout on/off                    -> dropout fwd+bwd cost
  - eval forward (same kNN config)    -> train-mode forward overhead
  - isolated gather+scatter at the stage-1 (C=6) / stage-2-3 (C=64)
    backward shapes                   -> the remaining scatters

Run ONCE in a background process (one TPU claim):
    python scripts/exp_train_breakdown_r3c.py > /tmp/exp_bd_r3c.log 2>&1
"""

import os
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
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


def _rt():
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    return (time.perf_counter() - t0) / 20


def _median_trials(run_batch, rt, trials=5, inner=5):
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run_batch(inner)
        ts.append((time.perf_counter() - t0 - rt) / inner)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, ts[0] * 1e3, ts[-1] * 1e3


def _step_ms(cfg, pts, labels, rt, tag):
    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
    st = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=True)
    mask = jnp.ones((B, N))
    t0 = time.perf_counter()
    st, m = step(st, pts, labels, mask)
    float(m["loss"])
    compile_s = time.perf_counter() - t0

    state = {"st": st}

    def batch(n):
        st = state["st"]
        for _ in range(n):
            st, m = step(st, pts, labels, mask)
        float(m["loss"])
        state["st"] = st

    med, lo, hi = _median_trials(batch, rt)
    log(f"{tag}: {med:.1f} ms [{lo:.1f}..{hi:.1f}] (compile {compile_s:.0f}s)")
    return med


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rt = _rt()
    log(f"rt: {rt*1e3:.1f} ms")
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))

    def cfg_v(i, **kw):
        # knn_query_chunk nudge forces a fresh trace per env-var variant
        return DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                           knn_impl="pallas_capped", knn_train_unroll=True,
                           knn_query_chunk=4096 + i, **kw)

    _step_ms(cfg_v(0), pts, labels, rt, "full step (defaults)")
    os.environ["DGCNN_STAGE_TAIL_SCATTER"] = "xla"
    _step_ms(cfg_v(1), pts, labels, rt, "full step stage-3 stock")
    os.environ.pop("DGCNN_STAGE_TAIL_SCATTER")
    _step_ms(cfg_v(2, dropout=0.0), pts, labels, rt, "full step dropout=0")
    _step_ms(cfg_v(3), pts, labels, rt, "full step again (drift)")

    cfg = cfg_v(0)
    params, state = init_dgcnn(jax.random.key(0), cfg)

    def loss_fn(p, s_, xx):
        logits, _ = apply_dgcnn(p, s_, xx, cfg, train=True,
                                rng=jax.random.key(3))
        return masked_smoothed_cross_entropy(logits, labels, mask)

    fwd = jax.jit(loss_fn)
    float(fwd(params, state, pts))

    def fwd_batch(n):
        acc = 0.0
        for _ in range(n):
            acc = fwd(params, state, pts)
        float(acc)

    med, lo, hi = _median_trials(fwd_batch, rt)
    log(f"train-mode forward only: {med:.1f} ms [{lo:.1f}..{hi:.1f}]")

    gradf = jax.jit(lambda p, s_, xx: jax.grad(loss_fn)(p, s_, xx)[
        "conv1"]["w"].sum())
    float(gradf(params, state, pts))

    def grad_batch(n):
        acc = 0.0
        for _ in range(n):
            acc = gradf(params, state, pts)
        float(acc)

    med, lo, hi = _median_trials(grad_batch, rt)
    log(f"forward+backward (no opt): {med:.1f} ms [{lo:.1f}..{hi:.1f}]")

    def eval_fn(p, s_, xx):
        logits, _ = apply_dgcnn(p, s_, xx, cfg, train=False)
        return logits.sum()

    ev = jax.jit(eval_fn)
    float(ev(params, state, pts))

    def ev_batch(n):
        acc = 0.0
        for _ in range(n):
            acc = ev(params, state, pts)
        float(acc)

    med, lo, hi = _median_trials(ev_batch, rt)
    log(f"eval forward (same cfg): {med:.1f} ms [{lo:.1f}..{hi:.1f}]")

    from dgcnn_tpu.ops.edgeconv import gather_neighbors

    idx = jax.random.randint(jax.random.key(6), (B, N, K), 0, N)
    for c in (6, 64):
        tab = jax.random.normal(jax.random.key(5), (B, N, c))
        gb = jax.jit(jax.grad(
            lambda t: jnp.sum(gather_neighbors(t, idx) ** 2)))
        g0 = gb(tab)
        float(g0.sum())

        def sc_batch(n, gb=gb, tab=tab):
            for _ in range(n):
                g = gb(tab)
            float(g.sum())

        med, lo, hi = _median_trials(sc_batch, rt)
        log(f"isolated gather fwd + scatter bwd C={c}: "
            f"{med:.2f} ms [{lo:.2f}..{hi:.2f}]")

    log("DONE")


if __name__ == "__main__":
    main()
