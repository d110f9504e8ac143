"""Insurance checkpoint: a small CPU-trained model on the soak scene.

When the tunnelled TPU is unavailable (round-3 outage), this trains a
REAL (if modest) model on the full_pipeline_run scene so trained-model
evidence studies (scripts/exp_ring_band_feature.py) aren't blocked on
the chip. N=2048/xla-kNN/10 epochs — weights are a valid DGCNN of the
production architecture; NOT a perf or accuracy artifact.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nice -n 19 \
    python scripts/cpu_train_insurance.py > /tmp/cpu_train.log 2>&1
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from dgcnn_tpu.train.loop import train
    from dgcnn_tpu.utils.logging import IOStream

    root = os.path.abspath("full_pipeline_run")
    npy = os.path.join(root, "npy")
    if not os.path.isdir(npy):
        print("soak scene missing — run scripts/full_pipeline_tpu.py "
              "through process_data first", flush=True)
        sys.exit(1)
    io = IOStream(os.path.join(root, "cpu_train.log"))
    summary = train(
        30, io, data_dir=npy, num_points=2048, epochs=10,
        num_classes=3, num_features=4, train_batch_size=8,
        validation_batch_size=8, lr=1e-3, emb_dims=1024,
        scheduler="cos", validation_prop=0.2,
        model_root=os.path.join(root, "ckpt_cpu"), exp_name="cpu",
        knn_impl="xla",
    )
    print("train summary:", summary, flush=True)


if __name__ == "__main__":
    main()
