"""Prediction-dump → LAS export.

Reference: /root/reference/predictions.py — converts ``*_pred_gt.txt`` dumps
(x y z pred) to LAS 1.2 / point-format 3 files, per file and per directory.
"""

from __future__ import annotations

import os

import numpy as np

from dgcnn_tpu.io.las import write_las


def predictions_to_las(pred_file: str, las_file: str):
    """One dump file → one LAS (/root/reference/predictions.py:8-24).

    Handles both dump layouts eval/test.py writes under the same
    ``*_pred_gt.txt`` name: 4 columns (x y z pred) by default, or the
    ``dump_logits=True`` layout (xyz, 3 feature cols, pred, gt, logits)
    where pred lives in column 6 — reading column 3 there would silently
    export the AGL feature as the LAS classification."""
    rows = np.loadtxt(pred_file)
    if rows.ndim == 1:
        rows = rows[None]
    points = rows[:, 0:3]
    labels = rows[:, 3] if rows.shape[1] <= 4 else rows[:, 6]
    write_las(las_file, points[:, 0], points[:, 1], points[:, 2], labels)
    return points, labels


def export_dir(pred_dir: str, out_dir: str) -> list[str]:
    """Every ``*pred_gt.txt`` in a dir → LAS
    (/root/reference/predictions.py:26-39)."""
    files = sorted(
        (f for f in os.listdir(pred_dir)
         if os.path.isfile(os.path.join(pred_dir, f))
         and f.endswith("pred_gt.txt")),
        key=str.lower,
    )
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for f in files:
        out = os.path.join(out_dir, f[:-4] + ".las")
        predictions_to_las(os.path.join(pred_dir, f), out)
        written.append(out)
    return written


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Extract DGCNN pointcloud predictions to LAS"
    )
    ap.add_argument("--pred_dir", default="predict")
    ap.add_argument("--out_dir", default="predict_las")
    a = ap.parse_args()
    for p in export_dir(a.pred_dir, a.out_dir):
        print(p)
