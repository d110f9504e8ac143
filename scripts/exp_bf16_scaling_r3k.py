"""bf16 + batch-scaling refresh at the round-3-continued baseline
(~63.5 ms train step / ~26 ms bench forward).

1. train step compute_dtype=bfloat16 vs f32 (the mix is now even more
   matmul-heavy after the stage-3 in-kernel backward — the last bf16
   measurement, 76.7 vs 80.9 ms, predates it);
2. eval forward bf16 vs f32 + TRAINED argmax agreement vs the f32 path
   (checkpoint from full_pipeline_run — run scripts/full_pipeline_tpu.py
   first, e.g. via tpu_batch_r3j.py);
3. train batch scaling refresh: B=16 flat and effective B=32 via
   --grad_accum 2 x 16 (BASELINE's rows predate every round-3 cut).

    python scripts/exp_bf16_scaling_r3k.py > /tmp/exp_r3k.log 2>&1
"""

import glob
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

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
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


def train_ms(rt, tag, b=B, grad_accum=1, qnudge=0, **cfg_kw):
    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped", knn_train_unroll=True,
                      knn_query_chunk=4096 + qnudge, **cfg_kw)
    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
    st = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=True, grad_accum=grad_accum)
    mb = b * grad_accum
    pts = jax.random.normal(jax.random.key(1), (mb, N, F))
    labels = jax.random.randint(jax.random.key(2), (mb, N), 0, C)
    mask = jnp.ones((mb, N))
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
    med = trials[len(trials) // 2] * 1e3
    log(f"{tag}: {med:.1f} ms [{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
        f"= {mb*N/(med/1e3)/1e3:,.0f}k pts/s (compile {compile_s:.0f}s)")
    return med


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rt = _rt()
    log(f"rt: {rt*1e3:.1f} ms")

    train_ms(rt, "train f32 (baseline)", qnudge=0)
    train_ms(rt, "train bf16 compute", qnudge=1, compute_dtype="bfloat16")
    train_ms(rt, "train f32 again (drift)", qnudge=2)
    train_ms(rt, "train B=16 f32", b=16, qnudge=3)
    train_ms(rt, "train eff-B=32 (grad_accum 2x16)", b=16, grad_accum=2,
             qnudge=4)

    # eval bf16: timing + trained agreement
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())

    def fwd_time(tag, qnudge, **kw):
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_query_chunk=4096 + qnudge, **kw)
        params, bn = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, s, xx):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0]
                           .astype(jnp.float32))

        float(fwd(params, bn, pts))
        for _ in range(6):
            float(fwd(params, bn, pts))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(6):
                float(fwd(params, bn, pts))
            trials.append((time.perf_counter() - t0) / 6 - rt)
        med = statistics.median(trials) * 1e3
        log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.1f}.."
            f"{max(trials)*1e3:.1f}] = {B*N/(med/1e3)/1e6:,.2f}M pts/s")
        fwd.clear_cache()

    fwd_time("eval f32 (baseline)", 0)
    fwd_time("eval bf16 compute", 1, compute_dtype="bfloat16")
    fwd_time("eval f32 again (drift)", 2)

    # trained agreement bf16 vs f32 on real soak blocks
    from dgcnn_tpu.train.checkpoint import load_named_subtrees

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
    if not files:
        log("no full_pipeline_run blocks — skipping agreement")
        return
    blocks = []
    for f in files:
        arr = np.load(f).astype(np.float32)[:, :4]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    xr = jnp.asarray(np.stack(blocks))

    preds = {}
    for tag, kw in (("f32", {}), ("bf16", {"compute_dtype": "bfloat16"})):
        cfg3 = DGCNNConfig(num_classes=3, num_features=F, k=K,
                           emb_dims=EMB, knn_impl="pallas_capped", **kw)
        p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg3)
        sub = load_named_subtrees("full_pipeline_run/ckpt/dgcnn_model.npz",
                                  {"params": p_tpl, "bn_state": s_tpl})

        @jax.jit
        def fwd(p, s, xx, cfg3=cfg3):
            return jnp.argmax(apply_dgcnn(p, s, xx, cfg3, train=False)[0],
                              -1)

        preds[tag] = np.asarray(fwd(sub["params"], sub["bn_state"], xr))
    agree = float((preds["f32"] == preds["bf16"]).mean())
    log(f"trained bf16 vs f32 argmax agreement: {agree:.6f}")
    log("DONE")


if __name__ == "__main__":
    main()
