"""Banded kNN phase 2: decision evidence for the knn_band default.

Completes what scripts/exp_banded_knn.py measured (its session died before
the trained-model section) and fixes its one methodology gap: the full
forward timings there did NOT subtract the ~25 ms tunnel round-trip that
bench.py subtracts, so 60.9/59.1 ms raw there == ~31/29 ms bench-style.

Measures, at the production shape (B=8, N=7000, k=30):
  1. driver entry() forward (compile-check, doubles as the verify drive);
  2. bench-style forward (rt-subtracted, median of 5x6) for
     knn_band in (0, 2048, 3072);
  3. TRAINED-model (full_pipeline_run soak, bacc 0.993) argmax agreement
     + prob drift on realistic ALS rooms: banded vs capped vs f32-exact;
  4. train step (unrolled capped + fused tails, the bench config) with
     knn_band 0 vs 3072.

Run ONCE in a background process:
    python scripts/exp_banded2.py > /tmp/exp_banded2.log 2>&1
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

B, N, K, F = 8, 7000, 30, 4


def log(*a):
    print(*a, flush=True)


def roundtrip_s():
    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    a = jnp.ones((8, 128))
    float(trivial(a))
    t0 = time.perf_counter()
    for _ in range(10):
        float(trivial(a))
    return (time.perf_counter() - t0) / 10


def real_rooms():
    import glob

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
    blocks = []
    for f in files:
        arr = np.load(f).astype(np.float32)[:, :4]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    return jnp.asarray(np.stack(blocks))


def bench_forward(cfg, params, state, x, rt, label):
    @jax.jit
    def fwd(params, state, xx):
        return jnp.sum(apply_dgcnn(params, state, xx, cfg, train=False)[0])

    t0 = time.perf_counter()
    float(fwd(params, state, x))
    compile_s = time.perf_counter() - t0
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(6):
            float(fwd(params, state, x))
        trials.append(max((time.perf_counter() - t0) / 6 - rt, 1e-9))
    trials.sort()
    med = trials[2]
    log(f"{label}: {med*1e3:.2f} ms [{trials[0]*1e3:.1f}.."
        f"{trials[-1]*1e3:.1f}] = {B*N/med:,.0f} pts/s "
        f"(compile {compile_s:.1f}s)")
    return med


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    import __graft_entry__ as g

    fn, args = g.entry()
    t0 = time.perf_counter()
    out = jax.tree_util.tree_leaves(fn(*args))[0]
    log(f"entry forward: {out.shape} {out.dtype} "
        f"(compile+run {time.perf_counter() - t0:.1f}s)")

    rt = roundtrip_s()
    log(f"round-trip: {rt*1e3:.1f} ms (subtracted below)")

    from bench import make_blocks

    x = jnp.asarray(make_blocks())

    # --- 2. bench-style forward, knn_band sweep ---
    for band in (0, 2048, 3072):
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K,
                          emb_dims=1024, knn_impl="pallas_capped",
                          knn_band=band)
        params, state = init_dgcnn(jax.random.key(0), cfg)
        bench_forward(cfg, params, state, x, rt, f"forward knn_band={band}")

    # --- 3. TRAINED-model agreement on real rooms ---
    from dgcnn_tpu.train.checkpoint import load_named_subtrees

    cfg3 = DGCNNConfig(num_classes=3, num_features=F, k=K, emb_dims=1024,
                       knn_impl="pallas_capped")
    p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg3)
    sub = load_named_subtrees("full_pipeline_run/ckpt/dgcnn_model.npz",
                              {"params": p_tpl, "bn_state": s_tpl})
    params3, state3 = sub["params"], sub["bn_state"]
    xr = real_rooms()

    @functools.partial(jax.jit, static_argnames="cfg")
    def logits_fn(params, state, xx, cfg):
        return apply_dgcnn(params, state, xx, cfg, train=False)[0]

    import dataclasses

    l_band = np.asarray(logits_fn(params3, state3, xr,
                                  dataclasses.replace(cfg3, knn_band=3072)))
    l_cap = np.asarray(logits_fn(params3, state3, xr, cfg3))
    l_ex = np.asarray(logits_fn(
        params3, state3, xr, dataclasses.replace(cfg3, knn_impl="pallas")))
    for tag, la, lb in (("banded-vs-capped", l_band, l_cap),
                        ("banded-vs-exact", l_band, l_ex),
                        ("capped-vs-exact", l_cap, l_ex)):
        am = (la.argmax(-1) == lb.argmax(-1)).mean()
        pa = np.asarray(jax.nn.softmax(jnp.asarray(la), -1))
        pb = np.asarray(jax.nn.softmax(jnp.asarray(lb), -1))
        drift = np.abs(pa - pb)
        log(f"trained {tag}: argmax agreement {am:.6f}, "
            f"mean prob drift {drift.mean():.2e}, max {drift.max():.2e}")

    # --- 4. train step, knn_band 0 vs 3072 ---
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))
    for band in (0, 3072):
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K,
                          emb_dims=1024, knn_impl="pallas_capped",
                          knn_train_unroll=True, knn_band=band)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        st, m = step(st, x, labels, mask)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                st, m = step(st, x, labels, mask)
                float(m["loss"])
            trials.append((time.perf_counter() - t0) / 5 - rt)
        trials.sort()
        log(f"train step knn_band={band}: {trials[1]*1e3:.1f} ms "
            f"[{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
            f"= {B*N/trials[1]:,.0f} pts/s (compile {compile_s:.1f}s)")

    log("DONE")


if __name__ == "__main__":
    main()
