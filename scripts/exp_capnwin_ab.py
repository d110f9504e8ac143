"""Full-forward A/B + trained-agreement guard for banded (cap,n_win)=(6,64).

The precise standalone sweep (exp_knn_sweep_precise.py) measured the
banded kernels 0.14 ms/call faster at (6, 64) than (8, 32) — same
Poisson loss class (~4e-5 vs ~2e-5/query), and exp_cap_nwin.py already
measured IDENTICAL trained argmax agreement (0.999982) for the (6,64)
variant via monkeypatch. This guards the new CONFIG-path defaults
(cfg.knn_band_cap/knn_band_nwin): interleaved full-forward timing and a
trained-model agreement check through the real wiring.

    python scripts/exp_capnwin_ab.py > /tmp/exp_capnwin_ab.log 2>&1
"""

import dataclasses
import functools
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

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def log(*a):
    print(*a, flush=True)


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

    arms = {}
    for name, kw, salt in (
            ("new (6,64)", {}, 0),
            ("old (8,32)", dict(knn_band_cap=8, knn_band_nwin=32), 1)):
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K,
                          emb_dims=EMB, knn_impl="pallas_capped",
                          knn_query_chunk=1024 + salt, **kw)
        params, bn = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, s, xx, cfg=cfg):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

        float(fwd(params, bn, pts))
        arms[name] = (fwd, params, bn, [])

    for _ in range(2):
        for fwd, params, bn, _ in arms.values():
            for _ in range(3):
                float(fwd(params, bn, pts))
    for t in range(7):
        for name, (fwd, params, bn, ts) in arms.items():
            t0 = time.perf_counter()
            for _ in range(6):
                float(fwd(params, bn, pts))
            ts.append((time.perf_counter() - t0) / 6 - rt)
    for name, (_, _, _, ts) in arms.items():
        med = statistics.median(ts) * 1e3
        log(f"{name}: {med:.2f} ms [{min(ts)*1e3:.2f}..{max(ts)*1e3:.2f}] "
            f"= {B*N/(med/1e3)/1e6:.2f}M pts/s")

    # trained agreement through the config path
    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
    if not files:
        log("no full_pipeline_run/npy — skipping agreement study")
        return
    from dgcnn_tpu.train.checkpoint import load_named_subtrees

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
    for name, kw in (("new (6,64)", {}),
                     ("old (8,32)", dict(knn_band_cap=8, knn_band_nwin=32))):
        la = np.asarray(logits_fn(
            params3, state3, xr, dataclasses.replace(cfg3, **kw)))
        am = (la.argmax(-1) == l_ex.argmax(-1)).mean()
        log(f"trained {name} vs f32-exact: argmax agreement {am:.6f}")
    log("DONE")


if __name__ == "__main__":
    main()
