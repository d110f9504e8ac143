"""Warm e2e tile A/B: predict() with the fused native tile load
(prepare/tile_load.py, round-5) vs the separate-stage chain
(DGCNN_TILE_LOAD=0). Interleaved warm repetitions; the device program is
identical in both arms (byte-equal inputs — tests/test_tile_load.py), so
the delta is pure host load-stage time."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import tempfile
import time

import numpy as np

from dgcnn_tpu.eval.predict import predict
from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.checkpoint import save_checkpoint
from dgcnn_tpu.train.steps import init_train_state, make_optimizer
from dgcnn_tpu.utils.logging import IOStream

B, N, K, F, C, EMB = 8, 7000, 30, 4, 5, 1024

rng = np.random.default_rng(0)
n = 400_000
xy = rng.random((n, 2)) * 100
z = 0.03 * xy[:, 0] + rng.normal(0, 0.05, n)
veg = rng.random(n) < 0.3
z[veg] += rng.random(int(veg.sum())) * 12

import jax  # noqa: E402

tmp = tempfile.mkdtemp()
las = os.path.join(tmp, "tile.las")
write_las(las, xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, rng.integers(0, 5, n))
cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                  knn_impl="approx")
state = init_train_state(jax.random.key(0), cfg, make_optimizer())
save_checkpoint(os.path.join(tmp, "m.npz"), state, epoch=0, mBPCA=0.0)
io = IOStream(os.path.join(tmp, "log.txt"), stream=sys.stderr)
kwargs = dict(
    num_points=N, block_size=30.0, num_classes=C, num_features=F,
    emb_dims=EMB, model_label="m", model_root=tmp,
    knn_impl="pallas_capped", batch_size=B,
)


def run():
    t0 = time.perf_counter()
    data, preds = predict(K, io, las, os.path.join(tmp, "out.las"),
                          **kwargs)
    return time.perf_counter() - t0, len(data)


run()  # compile + warm both host paths
os.environ["DGCNN_TILE_LOAD"] = "0"
run()
times = {"fused": [], "chain": []}
for _ in range(5):
    os.environ["DGCNN_TILE_LOAD"] = "1"
    times["fused"].append(run()[0])
    os.environ["DGCNN_TILE_LOAD"] = "0"
    times["chain"].append(run()[0])
for name, ts in times.items():
    ts = sorted(ts)
    print(f"e2e warm tile, {name:5s} load: {ts[len(ts)//2]:.2f} s "
          f"[{ts[0]:.2f}..{ts[-1]:.2f}]")
print(f"fused/chain speedup: "
      f"{sorted(times['chain'])[2] / sorted(times['fused'])[2]:.2f}x")
