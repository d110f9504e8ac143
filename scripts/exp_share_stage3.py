"""Shared-graph stage 3 (cfg.knn_share_stage3) measurements, one TPU claim:

1. eval forward A/B at the bench shape (median of interleaved trials)
2. full train step A/B
3. trained-model argmax agreement on the real soak scene: share3-on vs the
   production default, both on full_pipeline_run/ckpt (trained WITHOUT
   sharing), plus each vs the f32-exact graph path
4. 30-epoch soak trained WITH the knob on (fresh model_root under /tmp —
   the honest accuracy evidence: bacc/mIoU vs the recorded all-defaults
   0.9932/0.9865) — reuses full_pipeline_run/npy, touches nothing in it

    python scripts/exp_share_stage3.py > /tmp/exp_share3.log 2>&1
"""

import dataclasses as dc
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

B, N, K, EMB = 8, 7000, 30, 1024


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
    from dgcnn_tpu.models.dgcnn import (
        DGCNNConfig, apply_dgcnn, init_dgcnn,
    )

    pts = jnp.asarray(make_blocks())
    base = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=EMB,
                       knn_impl="pallas_capped")
    share = dc.replace(base, knn_share_stage3=True)

    # ---- 1. eval forward A/B (interleaved)
    params, state = init_dgcnn(jax.random.key(0), base)
    fwds = {}
    for tag, cfg in (("default", base), ("share3", share)):
        f = jax.jit(lambda xx, cfg=cfg: apply_dgcnn(
            params, state, xx, cfg, train=False)[0])
        t0 = time.perf_counter()
        float(f(pts).sum())
        log(f"eval {tag}: compile {time.perf_counter()-t0:.0f}s")
        fwds[tag] = {"f": f, "ts": []}
    for _ in range(7):
        for tag in ("default", "share3"):
            t0 = time.perf_counter()
            acc = None
            for _ in range(5):
                acc = fwds[tag]["f"](pts)
            float(acc.sum())
            fwds[tag]["ts"].append((time.perf_counter() - t0 - rt) / 5 * 1e3)
    for tag in ("default", "share3"):
        ts = sorted(fwds[tag]["ts"])
        med = ts[len(ts) // 2]
        log(f"eval fwd {tag}: {med:.1f} ms [{ts[0]:.1f}..{ts[-1]:.1f}] "
            f"({B*N/med*1e3/1e6:.2f}M pts/s)")

    # ---- 2. train step A/B (interleaved)
    from dgcnn_tpu.train.steps import (
        init_train_state, make_optimizer, make_train_step,
    )

    labels = jax.random.randint(jax.random.key(2), (B, N), 0, 5)
    mask = jnp.ones((B, N))
    arms = {}
    for tag, cfg in (("default", base), ("share3", share)):
        cfg = dc.replace(cfg, knn_train_unroll=True)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        st, m = step(st, pts, labels, mask)
        float(m["loss"])
        log(f"train {tag}: compile {time.perf_counter()-t0:.0f}s")
        arms[tag] = {"step": step, "st": st, "ts": []}
    for _ in range(7):
        for tag in ("default", "share3"):
            a = arms[tag]
            st = a["st"]
            t0 = time.perf_counter()
            for _ in range(5):
                st, m = a["step"](st, pts, labels, mask)
            float(m["loss"])
            a["st"] = st
            a["ts"].append((time.perf_counter() - t0 - rt) / 5 * 1e3)
    for tag in ("default", "share3"):
        ts = sorted(arms[tag]["ts"])
        med = ts[len(ts) // 2]
        log(f"train step {tag}: {med:.1f} ms [{ts[0]:.1f}..{ts[-1]:.1f}] "
            f"({B*N/med*1e3/1e3:.0f}k pts/s)")

    # ---- 3. trained-model agreement on the real scene
    root = os.path.abspath("full_pipeline_run")
    if os.path.isdir(os.path.join(root, "ckpt")):
        from dgcnn_tpu.data.dataset import FugroDataset
        from dgcnn_tpu.eval.test import _restore
        from dgcnn_tpu.utils.logging import IOStream

        io = IOStream(os.devnull)
        tcfg = DGCNNConfig(num_classes=3, num_features=4, k=K, emb_dims=EMB,
                           knn_impl="pallas_capped")
        tparams, tbn = _restore(tcfg, os.path.join(root, "ckpt"),
                                "dgcnn_model", io)
        ds = FugroDataset("test", os.path.join(root, "npy"),
                          num_point=7000, validation_prop=0.2,
                          classes=range(3), seed=1)
        batches = [b.points for b in ds.batches(
            8, shuffle=False, drop_last=True, with_mask=False)][:3]
        variants = {
            "default": tcfg,
            "share3": dc.replace(tcfg, knn_share_stage3=True),
            "exact": dc.replace(tcfg, knn_impl="pallas", knn_band=0,
                                knn_band_feature=0),
        }
        preds = {}
        for tag, cfg in variants.items():
            f = jax.jit(lambda xx, cfg=cfg: jnp.argmax(apply_dgcnn(
                tparams, tbn, xx, cfg, train=False)[0], -1))
            preds[tag] = np.concatenate(
                [np.asarray(f(jnp.asarray(xb))) for xb in batches], 0)
        npts = preds["default"].size
        for a, b in (("share3", "default"), ("share3", "exact"),
                     ("default", "exact")):
            agree = float((preds[a] == preds[b]).mean())
            log(f"trained argmax agreement {a} vs {b}: {agree:.6f} "
                f"({npts} pts)")
    else:
        log("no trained ckpt — skipping agreement")

    # ---- 4. 30-epoch soak WITH the knob on (fresh model_root)
    npy = os.path.join(root, "npy")
    if os.path.isdir(npy):
        from dgcnn_tpu.eval.test import test as run_test
        from dgcnn_tpu.train.loop import train
        from dgcnn_tpu.utils.logging import IOStream

        io = IOStream("/tmp/share3_soak.log")
        mroot = "/tmp/share3_ckpt"
        t0 = time.time()
        ts = train(30, io, data_dir=npy, num_points=7000, epochs=30,
                   num_classes=3, num_features=4, train_batch_size=8,
                   validation_batch_size=8, lr=1e-3, emb_dims=1024,
                   scheduler="cos", validation_prop=0.2, model_root=mroot,
                   exp_name="share3", tb_dir="/tmp/share3_tb",
                   knn_impl="pallas_capped", knn_share_stage3=True)
        log(f"share3 soak: {time.time()-t0:.0f}s -> {ts}")
        m = run_test(30, io, data_dir=npy, num_points=7000, num_classes=3,
                     num_features=4, test_batch_size=8, emb_dims=1024,
                     min_class_confidence=0.0, model_root=mroot,
                     pred_dir="/tmp/share3_dumps", validation_prop=0.2,
                     knn_impl="pallas_capped", knn_share_stage3=True)
        log(f"share3 soak eval: acc {m['accuracy']:.4f} "
            f"bacc {m['balanced_accuracy']:.4f} mIoU {m['mean_iou']:.4f}")
    else:
        log("no npy dir — skipping soak")
    log("DONE")


if __name__ == "__main__":
    main()
