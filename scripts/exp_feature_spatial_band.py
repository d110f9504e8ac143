"""Spatially-banded FEATURE-space kNN for stage 2 (and 3): timing + quality.

exp_feature_band_offline.py's finding: x1 features (stage-2 kNN input)
are spatially smooth — the plain SPATIAL x-sort order (which production
blocks already carry; no sort/permute needed) localises x1-space
neighbours better than any 1-D feature projection:

    x1 in-band recall, spatial-x order: 0.99961 @ band=3072 (trained
    model, real rooms); PCA projection 0.99777, best channel 0.99662.
    x2 (stage-3 input) is less localised (~0.996 @ 3072, round-3 notes).

No sound certificate exists for feature distances under a spatial key
(measured: a spatial-x "certificate" misses real neighbours), so this is
an UNCERTIFIED approximation — same evidence class as the capped kernel
itself (per-window cap overflow, accepted on measured agreement). This
experiment measures what it costs in quality and buys in time:

  1. full-forward A/B: stage-2 banded @ {4096, 3072} vs capped baseline
     (and stage2+3 banded @4096 for the upside bound);
  2. TRAINED-model argmax agreement + prob drift vs f32-exact.

    python scripts/exp_feature_spatial_band.py > /tmp/exp_fsb.log 2>&1
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

import dgcnn_tpu.kernels.knn_pallas as kp
import dgcnn_tpu.models.dgcnn as dg
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn
_STATE = {"calls": 0, "bands": None}


def log(*a):
    print(*a, flush=True)


def banded_feature_knn(x, k, band):
    """Banded kernel on an (already spatially-ordered) feature table —
    no certificate, no repair."""
    x = jax.lax.stop_gradient(x)
    idx, _keys = kp._knn_banded_jit(
        x, k, band=band, n_win=32, cap=8,
        query_tile=(512 if band <= 2048 else 384),
        unroll_cap=0, unroll_merge=0, interpret=False,
    )
    return idx


def set_variant(bands):
    """bands: (stage2_band, stage3_band), each a band or None (=capped).
    Patched at the model's _knn seam — exactly two non-spatial calls per
    forward, traced in stage order."""
    _STATE["calls"] = 0
    _STATE["bands"] = bands
    if bands is None:
        dg._knn = ORIG_KNN
        return

    def patched(x, cfg, *, train=False, spatial=False, sorted_ok=None):
        if spatial:
            return ORIG_KNN(x, cfg, train=train, spatial=spatial)
        i = _STATE["calls"]
        _STATE["calls"] += 1
        band = _STATE["bands"][i % 2]
        if band is None:
            return ORIG_KNN(x, cfg, train=train, spatial=spatial)
        return banded_feature_knn(x, cfg.k, band)

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

    def fwd_time(bands, tag):
        set_variant(bands)
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                          knn_impl="pallas_capped")
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
        set_variant(None)
        return med

    fwd_time(None, "baseline capped (256,8)")
    fwd_time((4096, None), "stage2 banded@4096")
    fwd_time((3072, None), "stage2 banded@3072")
    fwd_time((4096, 4096), "stage2+3 banded@4096")
    fwd_time(None, "baseline again (drift)")

    # trained-model quality vs f32-exact
    from dgcnn_tpu.train.checkpoint import load_named_subtrees
    import glob

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
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
    for bands, tag in ((None, "capped"),
                       ((4096, None), "s2@4096"),
                       ((3072, None), "s2@3072"),
                       ((4096, 4096), "s2+s3@4096")):
        set_variant(bands)
        la = np.asarray(logits_fn(params3, state3, xr, cfg3))
        logits_fn.clear_cache()   # the patch is not in the jit cache key
        set_variant(None)
        am = (la.argmax(-1) == l_ex.argmax(-1)).mean()
        pa = np.asarray(jax.nn.softmax(jnp.asarray(la), -1))
        pb = np.asarray(jax.nn.softmax(jnp.asarray(l_ex), -1))
        drift = np.abs(pa - pb)
        log(f"trained {tag} vs exact: argmax agreement {am:.6f}, "
            f"prob drift mean {drift.mean():.2e} max {drift.max():.2e}")
    log("DONE")


if __name__ == "__main__":
    main()
