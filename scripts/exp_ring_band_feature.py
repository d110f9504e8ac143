"""Banded-ring FEATURE-stage agreement study (trained model, CPU mesh).

The point-sharded path's stages 2-3 re-kNN in learned feature space;
ring banding there is UNcertified (parallel/ring_knn.py, certify=False)
and defaults OFF until agreement is evidenced on a trained model — this
script produces that evidence, mirroring the offline study that earned
knn_band_feature its default (scripts/exp_feature_band_offline.py).

Needs the 30-epoch soak checkpoint (scripts/full_pipeline_tpu.py →
full_pipeline_run/ckpt). Runs the whole study on the 8-virtual-device
CPU mesh (the ring path is backend-agnostic; eval only, N=8x2048).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/exp_ring_band_feature.py > /tmp/exp_ring_fb.log 2>&1
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import dataclasses

    from dgcnn_tpu.eval.test import _restore  # noqa: F401 (path check)
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.parallel.sharded_model import apply_dgcnn_sharded
    from dgcnn_tpu.utils.logging import IOStream

    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        log("need CPU backend with 8 virtual devices — see docstring")
        sys.exit(1)

    root = os.path.abspath("full_pipeline_run")
    raw = os.path.join(root, "raw", "tile.las")
    if (not os.path.exists(raw)
            or not os.path.isdir(
                os.path.join(root,
                             os.environ.get("DGCNN_RING_FB_CKPT", "ckpt")))):
        log("soak artifacts missing (run scripts/full_pipeline_tpu.py)")
        sys.exit(1)

    d = 8
    n = d * 2048
    # real whole-cloud prep (the --point_shards path): load + noise filter
    # (fused native loader), DTM -> AGL, then 3 contiguous x-windows of
    # the x-sorted scene as study clouds
    from dgcnn_tpu.eval.predict import predict_load
    from dgcnn_tpu.prepare.dtm import build_dtm, gen_agl

    data, _ = predict_load(raw)
    dtm = build_dtm(data[:, :3])
    data[:, 3] = gen_agl(dtm, data[:, :3])
    data = data[np.argsort(data[:, 0], kind="stable")]
    m = len(data)
    rooms = [data[int(f * (m - n)):int(f * (m - n)) + n]
             for f in (0.2, 0.5, 0.8)]
    log(f"{len(rooms)} x-windows of {n} points from {m}-pt scene")

    io = IOStream(os.devnull)
    base = DGCNNConfig(num_classes=3, num_features=4, k=30, emb_dims=1024,
                       knn_impl="xla", ring_band_shards=1)
    params, bn = _restore(base, os.path.join(root, os.environ.get("DGCNN_RING_FB_CKPT", "ckpt")),
                          os.environ.get("DGCNN_RING_FB_LABEL", "dgcnn_model"), io)
    mesh = make_mesh(n_data=1, n_points=d)

    for ri, room in enumerate(rooms):
        x = np.ascontiguousarray(room[:, :4], np.float32)[:n]
        x[:, 0] -= x[:, 0].min()
        x[:, 1] -= x[:, 1].min()
        x = x[np.argsort(x[:, 0], kind="stable")]
        xb = jnp.asarray(x)[None]

        # unsharded exact reference
        ref_logits, _ = apply_dgcnn(params, bn, xb, base, train=False)
        ref_pred = np.asarray(jnp.argmax(ref_logits[0], -1))
        ref_probs = np.asarray(jax.nn.softmax(ref_logits[0], -1))

        for fs in (0, 1, 2):
            cfg = dataclasses.replace(base, ring_band_feature_shards=fs)
            logits = apply_dgcnn_sharded(params, bn, xb, cfg, mesh)[0]
            pred = np.asarray(jnp.argmax(logits, -1))
            probs = np.asarray(jax.nn.softmax(logits, -1))
            agree = float((pred == ref_pred).mean())
            drift = float(np.abs(probs - ref_probs).max())
            log(f"room{ri} ring_band_feature_shards={fs}: "
                f"argmax agreement {agree:.6f}, max prob drift {drift:.4f}")
    log("DONE")


if __name__ == "__main__":
    main()
