"""Metrics over combined prediction dumps.

Reference: /root/reference/postprocess_data/metrics.py — overall accuracy,
balanced accuracy, mIoU over ``*_pred_gt_combined.txt`` rooms (pred col 6,
gt col 7). Reuses the shared metric core (dgcnn_tpu.ops.metrics) instead of
duplicating the IoU loop like the reference does (its metrics.py:38-47
duplicates util.py:60-76).
"""

from __future__ import annotations

import os

import numpy as np

from dgcnn_tpu.ops.metrics import calculate_sem_iou

PRED_COL, GT_COL = 6, 7


def evaluate_combined_dir(
    path: str, num_classes: int, test_area: str = "1"
) -> dict:
    """Accuracy / balanced accuracy / per-class+mean IoU over room dumps."""
    preds, gts = [], []
    room = 0
    while True:
        f = os.path.join(
            path, f"Area_{test_area}_room_{room}_pred_gt_combined.txt"
        )
        if not os.path.exists(f):
            break
        rows = np.loadtxt(f)
        if rows.ndim == 1:
            rows = rows[None]
        preds.append(rows[:, PRED_COL].astype(int))
        gts.append(rows[:, GT_COL].astype(int))
        room += 1
    if not preds:
        raise FileNotFoundError(f"no combined dumps under {path}")
    flat_p = np.concatenate(preds)
    flat_g = np.concatenate(gts)
    acc = float((flat_p == flat_g).mean())
    present = np.unique(flat_g)
    recalls = [
        (flat_p[flat_g == c] == c).mean() for c in present
    ]
    bacc = float(np.mean(recalls))
    ious = calculate_sem_iou(preds, gts, num_classes)
    return {
        "accuracy": acc,
        "balanced_accuracy": bacc,
        "iou": ious,
        "mean_iou": float(np.nanmean(ious)),
        "rooms": room,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="metrics over combined dumps")
    ap.add_argument("--path", required=True)
    ap.add_argument("--num_classes", type=int, default=5)
    ap.add_argument("--test_area", default="1")
    a = ap.parse_args()
    m = evaluate_combined_dir(a.path, a.num_classes, a.test_area)
    print(
        "Accuracy: %.6f, Avg accuracy: %.6f, mean IoU: %.6f"
        % (m["accuracy"], m["balanced_accuracy"], m["mean_iou"])
    )
