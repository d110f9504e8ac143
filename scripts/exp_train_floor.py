"""Train-step cost attribution with the replay/patch method.

The forward's attribution was wrong by 2.5x (exp_knn_floor3 — stale
standalone timings); this applies the same corrected method to the
61.9-63.9 ms train step: (a) kNN replayed as constant indices (its
in-step cost — forward-only, the graph is stop-gradient), (b) the s1/s2
backward row-scatters replaced by a cheap reduction that keeps the
cotangent computed but skips the RMW (its in-step cost), (c) the
stage-3 tail scatter kernel vs its XLA fallback (env knob A/B).

    python scripts/exp_train_floor.py > /tmp/exp_train_floor.log 2>&1
"""

import os
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
import dgcnn_tpu.ops.edgeconv as ec
from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn
ORIG_SCATTER = ec.scatter_rows_auto


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

    def step_time(tag, salt, *, knn_replay=False, no_scatter=False):
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_train_unroll=True,
                          knn_query_chunk=2048 + salt)
        if knn_replay:
            # capture the real train-graph indices once (dropout rng does
            # not affect kNN; eval-captured graphs match train's)
            traced = []

            def capture(x, cfg_, **kw):
                out = ORIG_KNN(x, cfg_, **kw)
                traced.append(out)
                return out

            dg._knn = capture
            from dgcnn_tpu.models.dgcnn import apply_dgcnn, init_dgcnn

            p0, s0 = init_dgcnn(jax.random.key(0), cfg)

            @jax.jit
            def run_capture(p, s, xx):
                traced.clear()
                lg = apply_dgcnn(p, s, xx, cfg, train=False)[0]
                return lg, tuple(traced)

            _, captured = run_capture(p0, s0, pts)
            stash = [np.asarray(c) for c in captured]
            calls = {"n": 0}

            def replay(x, cfg_, **kw):
                i = calls["n"]
                calls["n"] += 1
                return jnp.asarray(stash[i % 3])

            dg._knn = replay
        if no_scatter:
            def fake_scatter(dy, idx, n, dtype):
                # keep dy computed (a cheap full reduction) but skip the
                # row-RMW — isolates the scatter's in-step cost
                red = jnp.sum(dy, axis=tuple(range(1, dy.ndim - 1)))
                return jnp.broadcast_to(
                    red[:, None, :].astype(dtype),
                    (dy.shape[0], n, dy.shape[-1]))

            ec.scatter_rows_auto = fake_scatter

        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st0 = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=False)
        st, m = step(st0, pts, labels, mask)
        float(m["loss"])  # compile+run
        inner = 5
        st = st0
        for _ in range(inner):
            st, m = step(st, pts, labels, mask)
        float(m["loss"])  # warm discard
        trials = []
        for _ in range(5):
            st = st0
            t0 = time.perf_counter()
            for _ in range(inner):
                st, m = step(st, pts, labels, mask)
            float(m["loss"])
            trials.append((time.perf_counter() - t0 - rt) / inner)
        dg._knn = ORIG_KNN
        ec.scatter_rows_auto = ORIG_SCATTER
        med = statistics.median(trials) * 1e3
        log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.2f}.."
            f"{max(trials)*1e3:.2f}] = {B*N/(med/1e3)/1e3:.0f}k pts/s")
        return med

    a0 = step_time("anchor (defaults, unroll)", 0)
    nk = step_time("kNN replayed", 1, knn_replay=True)
    ns = step_time("s1/s2 scatters skipped", 2, no_scatter=True)
    os.environ["DGCNN_STAGE_TAIL_SCATTER"] = "xla"
    sx = step_time("stage-3 tail scatter = XLA", 3)
    os.environ.pop("DGCNN_STAGE_TAIL_SCATTER", None)
    a1 = step_time("anchor again (drift)", 4)
    log(f"=> in-step kNN {a0-nk:.2f} ms | s1/s2 scatters {a0-ns:.2f} | "
        f"tail-XLA delta {sx-a0:+.2f} | anchors {a0:.2f}/{a1:.2f}")
    log("DONE")


if __name__ == "__main__":
    main()
