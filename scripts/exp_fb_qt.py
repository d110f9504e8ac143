"""Feature-banded stage 2-3 query-tile A/B at the new default band=4096.

The banded kernel's default qt is 512 for band<=2048 and the v5e table
value (384) above that (kernels/knn_pallas.py::knn_pallas_feature_banded).
At band=4096 the score tile is (4096, qt) — 6.3 MB at 384, 8.4 at 512 —
both far inside the VMEM budget, so the wider tile may win like it did at
band<=2048 (fewer grid steps). Full-forward A/B with rt-once + drift
bracketing (the exp_stage_unroll4.py methodology: sub-ms kernel timings
through the tunnelled chip are garbage).

    python scripts/exp_fb_qt.py > /tmp/exp_fb_qt.log 2>&1
"""

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

import dgcnn_tpu.kernels.knn_pallas as kp
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

    orig = kp.knn_pallas_feature_banded

    def fwd_time(qt, tag):
        if qt is None:
            kp_fb = orig
        else:
            def kp_fb(x, k, **kw):
                kw["query_tile"] = qt
                return orig(x, k, **kw)
        kp.knn_pallas_feature_banded = kp_fb
        import dgcnn_tpu.models.dgcnn as dg  # late import site in _knn

        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                          knn_impl="pallas_capped",
                          # distinct hash per variant: the monkeypatch is
                          # not part of the jit key
                          knn_query_chunk=1024 + (qt or 0))
        params, bn = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, s, xx):
            return jnp.sum(apply_dgcnn(p, s, xx, cfg, train=False)[0])

        float(fwd(params, bn, pts))
        for _ in range(6):
            out = fwd(params, bn, pts)
        float(out)
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(6):
                out = fwd(params, bn, pts)
            float(out)
            trials.append((time.perf_counter() - t0 - rt) / 6)
        med = statistics.median(trials) * 1e3
        log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.1f}.."
            f"{max(trials)*1e3:.1f}] = {B*N/(med/1e3)/1e6:,.2f}M pts/s")
        fwd.clear_cache()
        kp.knn_pallas_feature_banded = orig
        return med

    fwd_time(None, "default (qt=384 @4096)")
    fwd_time(512, "qt=512")
    fwd_time(256, "qt=256")
    fwd_time(None, "default again (drift)")
    log("DONE")


if __name__ == "__main__":
    main()
