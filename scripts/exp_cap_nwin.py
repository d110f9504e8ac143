"""(cap, n_win) sweep for the banded kNN kernels (one TPU process).

The banded kernels' per-stage cost is ~ cap*band*qt (extraction) +
k*cap*n_win*qt (merge); recall loss is the Poisson tail
P(window load > cap) * n_win with lambda = k/n_win (the round-robin
window split de-clusters candidates). At the defaults (cap=8, n_win=32,
lambda=0.94) the tail is ~2e-5..5e-5. Candidate (6,64): lambda=0.47,
tail P(X>=7)*64 ~ 4e-5 — same loss class, 25% fewer extraction passes,
merge pool 256->384 (small share). (5,128): tail ~2.3e-5, extraction
-37.5%, but merge pool 640 eats most of it on band=2048; plausible on
band=4096 feature stages where extraction dominates more.

Method per CLAUDE.md: full-forward A/B with rt-once + warm-discard +
baseline drift bracketing; sub-ms standalone timings through the
tunnelled chip are garbage. Then trained-model argmax agreement vs
f32-exact for the winners (needs full_pipeline_run/ from the soak), and
a train-step A/B at the winning combo.

    python scripts/exp_cap_nwin.py > /tmp/exp_cap_nwin.log 2>&1
"""

import dataclasses
import functools
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
from dgcnn_tpu.kernels.knn_pallas import (
    knn_pallas_banded,
    knn_pallas_feature_banded,
)
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn
_STATE = {"s1": None, "fb": None}


def log(*a):
    print(*a, flush=True)


def set_variant(s1, fb):
    """s1/fb: None (production defaults) or (cap, n_win)."""
    _STATE["s1"] = s1
    _STATE["fb"] = fb
    if s1 is None and fb is None:
        dg._knn = ORIG_KNN
        return

    def patched(x, cfg, *, train=False, spatial=False, sorted_ok=None):
        tune = _STATE["s1"] if spatial else _STATE["fb"]
        if tune is None:
            return ORIG_KNN(x, cfg, train=train, spatial=spatial,
                            sorted_ok=sorted_ok)
        cap, n_win = tune
        if spatial:
            return knn_pallas_banded(
                x, cfg.k, band=cfg.knn_band, cap=cap, n_win=n_win,
                unroll_cap=(0 if (not train or cfg.knn_train_unroll)
                            else 1),
            )
        return knn_pallas_feature_banded(
            x, cfg.k, sorted_ok=sorted_ok, band=cfg.knn_band_feature,
            cap=cap, n_win=n_win,
            unroll_cap=(0 if (not train or cfg.knn_train_unroll) else 1),
        )

    dg._knn = patched


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    def fwd_time(s1, fb, tag, salt):
        set_variant(s1, fb)
        # salt the cfg hash so the jit cache cannot serve another
        # variant's executable (the monkeypatch is not in the key)
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                          knn_impl="pallas_capped",
                          knn_query_chunk=1024 + salt)
        params, bn = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, s, xx):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

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
        set_variant(None, None)
        return med

    fwd_time(None, None, "baseline (8,32)/(8,32)", 0)
    fwd_time(None, (6, 64), "fb(6,64)", 1)
    fwd_time(None, (5, 128), "fb(5,128)", 2)
    fwd_time((6, 64), None, "s1(6,64)", 3)
    fwd_time((6, 64), (6, 64), "s1(6,64)+fb(6,64)", 4)
    fwd_time((6, 64), (5, 128), "s1(6,64)+fb(5,128)", 5)
    fwd_time(None, None, "baseline again (drift)", 6)

    # trained-model argmax agreement vs f32-exact (soak artifacts)
    import glob

    from dgcnn_tpu.train.checkpoint import load_named_subtrees

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
    if not files:
        log("no full_pipeline_run/npy — skipping agreement study")
        return
    blocks = []
    for f in files:
        arr = np.load(f).astype(np.float32)[:, :4]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    xr = jnp.asarray(np.stack(blocks))

    cfg3 = DGCNNConfig(num_classes=3, num_features=F, k=K, emb_dims=1024,
                       knn_impl="pallas_capped")
    p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg3)
    sub = load_named_subtrees("full_pipeline_run/ckpt/dgcnn_model.npz",
                              {"params": p_tpl, "bn_state": s_tpl})
    params3, state3 = sub["params"], sub["bn_state"]

    @functools.partial(jax.jit, static_argnames="cfg")
    def logits_fn(params, state, xx, cfg):
        return apply_dgcnn(params, state, xx, cfg, train=False)[0]

    l_ex = np.asarray(logits_fn(
        params3, state3, xr, dataclasses.replace(cfg3, knn_impl="pallas")))
    logits_fn.clear_cache()
    for s1, fb, tag in ((None, None, "baseline (8,32)"),
                        (None, (6, 64), "fb(6,64)"),
                        ((6, 64), (6, 64), "s1+fb(6,64)"),
                        ((6, 64), (5, 128), "s1(6,64)+fb(5,128)")):
        set_variant(s1, fb)
        la = np.asarray(logits_fn(params3, state3, xr, cfg3))
        logits_fn.clear_cache()
        set_variant(None, None)
        am = (la.argmax(-1) == l_ex.argmax(-1)).mean()
        log(f"trained {tag} vs exact: argmax agreement {am:.6f}")

    # train step A/B at the plausible winner
    from dgcnn_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    labels = jax.random.randint(jax.random.key(2), (B, N), 0, C)
    mask = jnp.ones((B, N))
    for vi, (s1, fb, tag) in enumerate((
            (None, None, "baseline"),
            ((6, 64), (6, 64), "s1+fb(6,64)"))):
        set_variant(s1, fb)
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=1024, knn_impl="pallas_capped",
                          knn_train_unroll=True,
                          knn_query_chunk=2048 + vi)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        st = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        t0 = time.perf_counter()
        st, m = step(st, pts, labels, mask)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                st, m = step(st, pts, labels, mask)
            float(m["loss"])
            trials.append((time.perf_counter() - t0 - rt) / 5)
        trials.sort()
        set_variant(None, None)
        log(f"train step {tag}: {trials[1]*1e3:.1f} ms "
            f"[{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
            f"= {B*N/trials[1]:,.0f} pts/s (compile {compile_s:.1f}s)")
    log("DONE")


if __name__ == "__main__":
    main()
