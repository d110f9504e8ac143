"""A/B: optax.flatten'd optimizer update (ONE concatenated-vector kernel
chain) vs the per-leaf chain (~50 tiny launch-bound kernels) inside the
full production train step. The step breakdown at ~63.5 ms put
optimizer+confusion at ~4 ms; flattening targets the launch-bound part.

Interleaved trials (flat, leaf, flat, leaf, ...) so chip drift hits both
arms equally. Run ONCE in a background process (one TPU claim):

    python scripts/exp_opt_flatten.py > /tmp/exp_opt_flatten.log 2>&1
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig
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


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rt = _rt()
    log(f"rt: {rt*1e3:.1f} ms")
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))

    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped", knn_train_unroll=True)

    arms = {}
    for flat in (True, False):
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100,
                            flatten=flat)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        st, m = step(st, pts, labels, mask)
        loss0 = float(m["loss"])
        log(f"flatten={flat}: compile {time.perf_counter()-t0:.0f}s "
            f"first-step loss {loss0:.6f}")
        arms[flat] = {"step": step, "st": st, "ts": []}

    # interleaved trials
    inner, trials = 5, 7
    for t in range(trials):
        for flat in (True, False):
            a = arms[flat]
            t0 = time.perf_counter()
            st = a["st"]
            for _ in range(inner):
                st, m = a["step"](st, pts, labels, mask)
            a.setdefault("losses", []).append(float(m["loss"]))
            a["st"] = st
            a["ts"].append((time.perf_counter() - t0 - rt) / inner * 1e3)

    for flat in (True, False):
        ts = sorted(arms[flat]["ts"])
        med = ts[len(ts) // 2]
        log(f"flatten={flat}: {med:.1f} ms [{ts[0]:.1f}..{ts[-1]:.1f}] "
            f"({B*N/med*1e3/1e3:.0f}k pts/s)  trials={['%.1f'%x for x in arms[flat]['ts']]}")
    # loss trajectories must agree (same arithmetic per element) — compare
    # the per-trial LOSS values, not step counters (those are equal by
    # construction)
    d = max(abs(a - b) for a, b in
            zip(arms[True]["losses"], arms[False]["losses"]))
    log(f"loss-trajectory drift (max over {len(arms[True]['losses'])} "
        f"trial endpoints): {d:.3e}")
    assert d < 1e-4, f"flattened optimizer diverged from per-leaf: {d}"
    log("DONE")


if __name__ == "__main__":
    main()
