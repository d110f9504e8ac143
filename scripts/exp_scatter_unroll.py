"""Scatter-add copies x unroll sweep: 16 copies (never swept — the in-step
knob caps at 8 via the 16 MiB accumulator budget) and the new per-copy
``unroll`` knob (rows per fori step; hazard distance stays = copies).

Standalone kernel timing at the train-step shape uses reps-in-jit (the
tunnelled chip's ~30 ms round-trip makes single-call timings garbage),
then a full train-step A/B via the env knobs for the winners.

    python scripts/exp_scatter_unroll.py > /tmp/exp_scatter_unroll.log 2>&1
"""

import functools
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

from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

B, N, K, C, EMB = 8, 7000, 30, 64, 1024
REPS = 6


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    m = N * K
    dy = jnp.asarray(rng.normal(size=(B, m, C)).astype(np.float32))
    q = np.repeat(np.arange(N), K)[None, :].repeat(B, 0)
    idx = np.clip(q + rng.integers(-300, 300, (B, m)), 0, N - 1)
    idx = jnp.asarray(idx.astype(np.int32))

    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    ref = np.asarray(
        jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], idx].add(dy))

    for copies in (8, 16, 32):
        for unroll in (1, 2, 4):
            fn = functools.partial(scatter_add_rows, n=N, chunk=2048,
                                   copies=copies, unroll=unroll)

            @jax.jit
            def many(dy, idx):
                acc = jnp.float32(0)
                for j in range(REPS):
                    out = fn(dy + jnp.float32(j), idx)
                    acc = acc + out[0, 0, 0]
                return acc

            try:
                float(many(dy, idx))
                out = np.asarray(fn(dy, idx))
                err = np.abs(out - ref).max() / np.abs(ref).max()
                float(many(dy, idx))
                trials = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(many(dy, idx))
                    trials.append((time.perf_counter() - t0 - rt) / REPS)
                trials.sort()
                log(f"copies={copies} unroll={unroll}: "
                    f"{trials[1]*1e3:.2f} ms "
                    f"[{trials[0]*1e3:.2f}..{trials[-1]*1e3:.2f}] "
                    f"(rel err {err:.1e})")
            except Exception as e:
                log(f"copies={copies} unroll={unroll}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}")

    # ---- full train step A/B via env knobs (the real decision metric)
    from bench import make_blocks
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    pts = jnp.asarray(make_blocks())
    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))

    def step_time(env, tag, qc):
        for k_, v in env.items():
            os.environ[k_] = str(v)
        try:
            cfg = DGCNNConfig(num_classes=5, num_features=4, k=K,
                              emb_dims=EMB, knn_impl="pallas_capped",
                              knn_train_unroll=True,
                              knn_query_chunk=qc)  # distinct jit key
            tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
            st = init_train_state(jax.random.key(0), cfg, tx)
            step = make_train_step(cfg, tx, donate=True)
            t0 = time.perf_counter()
            st, mtr = step(st, pts, labels, mask)
            float(mtr["loss"])
            compile_s = time.perf_counter() - t0
            st, mtr = step(st, pts, labels, mask)
            float(mtr["loss"])
            trials = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    st, mtr = step(st, pts, labels, mask)
                float(mtr["loss"])
                trials.append((time.perf_counter() - t0 - rt) / 5)
            trials.sort()
            log(f"train step {tag}: {trials[1]*1e3:.1f} ms "
                f"[{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
                f"(compile {compile_s:.1f}s)")
        finally:
            for k_ in env:
                os.environ.pop(k_, None)

    step_time({}, "baseline (copies=8,unroll=1)", 1024)
    step_time({"DGCNN_SCATTER_UNROLL": 4}, "copies=8 unroll=4", 1025)
    step_time({"DGCNN_SCATTER_COPIES": 16, "DGCNN_SCATTER_VMEM_MB": 32},
              "copies=16 unroll=1", 1026)
    step_time({"DGCNN_SCATTER_COPIES": 16, "DGCNN_SCATTER_VMEM_MB": 32,
               "DGCNN_SCATTER_UNROLL": 2}, "copies=16 unroll=2", 1027)
    step_time({}, "baseline again (drift)", 1028)
    log("DONE")


if __name__ == "__main__":
    main()
