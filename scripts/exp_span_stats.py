"""Span statistics for the tile-local gather experiment (VERDICT item 6).

For each 128-query tile, the fused stage kernels gather qt*k = 3840
neighbour rows from the (N, C) VMEM table by dynamic sublane loads
(~3.2 cycles/row issue rate). If a tile's neighbour rows all fall in a
narrow contiguous span, the span could be loaded ONCE with contiguous
vector loads and neighbours resolved tile-locally (one-hot MXU gather).
This measures the per-tile span (max idx - min idx) distribution on the
bench workload for all three stages' REAL kNN graphs:
  stage 1: coordinate kNN on x-sorted blocks,
  stages 2-3 stand-in: feature kNN on the first edgeconv's features from
  a randomly-initialised model (the trained graph is what production
  sees; random-init features are spatially smoother, so this is a LOWER
  bound on span — checked against the banded-kernel band for sanity).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_blocks
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.knn import knn

QT = 128
x = jnp.asarray(make_blocks())
b, n, _ = x.shape

cfg = DGCNNConfig(num_classes=5, num_features=int(x.shape[-1]), k=30,
                  emb_dims=1024)
params, state = init_dgcnn(jax.random.key(0), cfg)
(_, feats), _ = apply_dgcnn(params, state, x, cfg, train=False,
                            depth=1, with_logits=True)
print("stage-2 feature table:", feats.shape)


def spans(idx):
    idx = np.asarray(idx)
    out = []
    for bi in range(idx.shape[0]):
        for q0 in range(0, n - QT + 1, QT):
            t = idx[bi, q0:q0 + QT]
            out.append(int(t.max() - t.min()))
    return np.asarray(out)


for name, table in (("stage1 (coords)", x),
                    ("stage2 (features)", feats)):
    idx = knn(table, 30, query_chunk=2048)
    s = spans(idx)
    print(f"{name}: span per {QT}-query tile  "
          f"p50={np.percentile(s, 50):.0f} p90={np.percentile(s, 90):.0f} "
          f"p99={np.percentile(s, 99):.0f} max={s.max()}  "
          f"(tiles={len(s)})")
    # W needed to cover all tiles at various coverage levels
    for w in (512, 1024, 2048, 4096):
        frac = float((s <= w - QT).mean())
        print(f"    W={w}: covers {frac:.4f} of tiles")


# Per-ROW |neighbour - query| distance distribution: a hybrid kernel
# (one-hot over a W-window centred on the tile + dynamic loads for the
# stragglers) cares about the fraction of ROWS outside the window, not
# the worst pair in a tile.
print()
for name, table in (("stage1 (coords)", x),
                    ("stage2 (features)", feats)):
    idx = np.asarray(knn(table, 30, query_chunk=2048))
    q = np.arange(n)[None, :, None]
    d = np.abs(idx - q).ravel()
    print(f"{name}: |idx-q| p50={np.percentile(d, 50):.0f} "
          f"p90={np.percentile(d, 90):.0f} p99={np.percentile(d, 99):.0f} "
          f"p999={np.percentile(d, 99.9):.0f} max={d.max()}")
    for w in (256, 512, 1024, 2048):
        # window centred on the 128-query tile: rows within w/2 - 64 of
        # the tile centre are guaranteed in-window for every tile layout
        frac = float((d <= w // 2 - QT // 2).mean())
        print(f"    W={w}: in-window row fraction {frac:.5f} "
              f"(stragglers/tile ~{(1 - frac) * QT * 30:.0f})")
