"""Measure the hierarchical capped packed-kNN kernel vs the flat packed
kernel on TPU, plus its effect on the full forward, the train step (with
one-pass BN), and eval batch scaling.

Run ONCE in a background process (TPU claim handoff is slow):
    nohup python scripts/exp_knn_capped.py > /tmp/exp_capped.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.utils.profiling import measure

B, N, K, F = 8, 7000, 30, 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)
    print(*a, flush=True)


def make_x(b=B, n=N, seed=0):
    """Delegates to bench.make_blocks — ONE generator for bench and
    experiment scripts (x-sorted 30 m LiDAR-like blocks)."""
    from bench import make_blocks

    blocks = make_blocks(b=b, n=n, seed=seed)
    return jnp.asarray(blocks[..., :3].copy()), jnp.asarray(blocks)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    x3, feats = make_x()

    # --- kernel-level sweep (chain reps inside one jit: a single call is
    # cheaper than the host<->device sync, so per-call timing reads ~0) ---
    import functools
    REPS = 8  # the 20-rep chained program tripped the remote-compile helper

    def time_kernel(kw):
        fn = functools.partial(knn_pallas, k=K, **kw)

        @jax.jit
        def many(x):
            acc = jnp.int32(0)
            for j in range(REPS):
                idx = fn(x + jnp.float32(j) * 1e-6)
                acc = acc + idx[0, 0, 0]
            return acc

        float(many(x3))  # compile
        float(many(x3))
        t0 = time.perf_counter()
        n_outer = 3
        for _ in range(n_outer):
            float(many(x3))
        return (time.perf_counter() - t0) / (n_outer * REPS)

    variants = [
        ("capped c8 w256", dict(packed=True, cap=8, window=256)),
        ("packed flat", dict(packed=True)),
        ("capped c8 w128", dict(packed=True, cap=8, window=128)),
        ("capped c10 w256", dict(packed=True, cap=10, window=256)),
        ("capped c8 w256 qt256", dict(packed=True, cap=8, window=256, query_tile=256)),
    ]
    ref = None
    for name, kw in variants:
        try:
            sec = time_kernel(kw)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        out = np.asarray(knn_pallas(x3, K, **kw))
        note = ""
        if name == "packed flat":
            ref = out
        elif ref is not None and out.shape == ref.shape:
            rows = int((out != ref).any(-1).sum())
            note = f" (rows!=flat: {rows}/{out.shape[0]*out.shape[1]})"
        log(f"{name}: {sec*1e3:.2f} ms{note}")

    # --- forward at B=8 with each impl ---
    for impl, extra in [
        ("pallas_packed", {}),
        ("pallas_capped", {}),
        ("pallas", {}),
    ]:
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K, knn_impl=impl)
        try:
            params, state = init_dgcnn(jax.random.key(0), cfg)
            f = jax.jit(lambda p, s, xx: apply_dgcnn(p, s, xx, cfg)[0])
            r = measure(f, params, state, feats, iters=10, warmup=3)
            ms = r["sec_per_call"] * 1e3
            log(f"forward B=8 {impl}: {ms:.2f} ms ({B*N/ r['sec_per_call']/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"forward {impl}: FAILED {type(e).__name__}: {e}")

    # --- eval batch scaling with capped ---
    for b in (16, 32):
        _, fb = make_x(b=b)
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K,
                          knn_impl="pallas_capped")
        try:
            params, state = init_dgcnn(jax.random.key(0), cfg)
            f = jax.jit(lambda p, s, xx: apply_dgcnn(p, s, xx, cfg)[0])
            r = measure(f, params, state, fb, iters=6, warmup=2)
            log(f"forward B={b} pallas_capped: {r['sec_per_call']*1e3:.2f} ms "
                f"({b*N/ r['sec_per_call']/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"forward B={b}: FAILED {type(e).__name__}: {e}")

    # --- train step: one-pass vs two-pass BN, and capped-kNN training ---
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from dgcnn_tpu.utils.profiling import roundtrip_seconds

    def step_time(bn, impl):
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K,
                          knn_impl=impl, bn_stats=bn)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        labels = jnp.zeros((B, N), jnp.int32)
        mask = jnp.ones((B, N), jnp.float32)
        st, m = step(st, feats, labels, mask)
        _ = float(m["loss"])
        rt = roundtrip_seconds()
        t0 = time.perf_counter()
        for _ in range(8):
            st, m = step(st, feats, labels, mask)
            _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 8 - rt
        return dt * 1e3, B * N / dt

    for bn, impl in [("one_pass", "approx"), ("two_pass", "approx"),
                     ("one_pass", "pallas_capped")]:
        try:
            ms_, pps = step_time(bn, impl)
            log(f"train step bn={bn} knn={impl}: {ms_:.2f} ms ({pps/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"train bn={bn} knn={impl}: FAILED {type(e).__name__}: {str(e)[:200]}")

    log("done")


if __name__ == "__main__":
    main()
