"""On-device training smoke: synthesise a scene, run the real train() loop
on the TPU, and check the model actually learns (validates the train-mode
BN/dropout/optimizer numerics on hardware, not just CPU)."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_rooms(out_dir: str, n_rooms=10, n_points=4096, seed=0):
    """Learnable synthetic rooms: 3 classes separable by AGL."""
    rng = np.random.default_rng(seed)
    for i in range(n_rooms):
        xy = rng.random((n_points, 2)) * 30
        agl = np.abs(rng.normal(0, 0.1, n_points))          # ground
        labels = np.ones(n_points)
        build = rng.random(n_points) < 0.25
        agl[build] = rng.normal(6, 0.5, int(build.sum()))    # buildings
        labels[build] = 0
        veg = (rng.random(n_points) < 0.35) & ~build
        agl[veg] = rng.random(int(veg.sum())) * 14 + 1       # vegetation
        labels[veg] = 2
        z = 0.02 * xy[:, 0] + agl
        data = np.column_stack([xy, z, agl, labels])
        np.save(os.path.join(out_dir, f"Area_{i}.npy"), data)


def main():
    from dgcnn_tpu.train.loop import train
    from dgcnn_tpu.utils.logging import IOStream

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = os.path.join(tmp, "rooms")
        os.makedirs(data_dir)
        make_rooms(data_dir)
        io = IOStream(os.path.join(tmp, "train.log"))
        t0 = time.time()
        summary = train(
            20, io,
            data_dir=data_dir,
            num_points=2048,
            epochs=8,
            num_classes=3,
            num_features=4,
            train_batch_size=4,
            validation_batch_size=4,
            lr=2e-3,
            emb_dims=256,
            validation_prop=0.2,
            model_root=os.path.join(tmp, "ckpt"),
            exp_name="tpu_smoke",
            tb_dir=os.path.join(tmp, "tb"),
            knn_impl="approx",
        )
        print(f"\nTPU train smoke: {time.time()-t0:.0f}s, summary={summary}")
        # only ~16 optimizer steps total — the bar is 'clearly above chance
        # (1/3) and climbing', not convergence (measured 0.73 at 8 epochs)
        assert summary["best_balanced_accuracy"] > 0.55, summary
        print("PASS: model learns on device")


if __name__ == "__main__":
    main()
