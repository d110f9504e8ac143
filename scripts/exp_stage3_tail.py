"""Stage-3 fused-tail backward A/B (one TPU process).

Variant "kernel": edge_stage_tail_train's backward scatters cotangent
rows COMPUTED IN-KERNEL from q-indexed tables
(kernels/scatter_pallas.py::scatter_stage_tail_rows) — the (B,N,k,64)
de tensor never exists in HBM and e leaves the residuals. Variant
"stock": same custom VJP but de materialised + scatter_add_rows (the
round-3 production path, for a like-for-like A/B). Expected ~1.5-2 ms
off the train step (e read + de write + de read ~ 1.29 GB at HBM rate).
Also checks grad parity kernel-vs-stock on device.

    python scripts/exp_stage3_tail.py > /tmp/exp_stage3_tail.log 2>&1
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
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    grads = {}
    for vi, impl in enumerate(("stock", "kernel", "stock")):
        os.environ["DGCNN_STAGE_TAIL_SCATTER"] = (
            "kernel" if impl == "kernel" else "other")
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_train_unroll=True,
                          knn_query_chunk=4096 + vi)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        st, m = step(st, pts, labels, mask)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                st, m = step(st, pts, labels, mask)
            float(m["loss"])
            trials.append((time.perf_counter() - t0 - rt) / 5)
        trials.sort()
        log(f"train step {impl}: {trials[len(trials)//2]*1e3:.1f} ms "
            f"[{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
            f"(compile {compile_s:.1f}s)")
        if impl not in grads:
            # one-step grad snapshot for parity (fresh state, no donate)
            st2 = init_train_state(jax.random.key(0), cfg, tx)
            step2 = make_train_step(cfg, tx, donate=False)
            st3, _ = step2(st2, pts, labels, mask)
            grads[impl] = jax.tree.map(
                lambda fresh, stepped: np.asarray(stepped - fresh),
                st2.params, st3.params)
    os.environ.pop("DGCNN_STAGE_TAIL_SCATTER", None)

    leaves_k = jax.tree.leaves(grads["kernel"])
    leaves_s = jax.tree.leaves(grads["stock"])
    worst = max(
        float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))
        for a, b in zip(leaves_k, leaves_s))
    log(f"param-update parity kernel vs stock: worst rel {worst:.3e}")
    log("DONE")


if __name__ == "__main__":
    main()
