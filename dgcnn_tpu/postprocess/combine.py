"""Multi-scale result fusion.

Reference: /root/reference/postprocess_data/combine_results.py — merges two
runs at different block sizes by exact-XYZ co-location; where predictions
disagree, keeps the one whose own-class probability is higher (:81-84).
The reference's per-point Python dict join is replaced by a vectorised
structured-array intersect; row contract preserved (xyz 0:3, rni 3:6,
pred 6, gt 7, probs 8: in; xyz rni pred gt out).
"""

from __future__ import annotations

import os

import numpy as np

from dgcnn_tpu.postprocess.prob_map import add_probability_columns


def _xyz_keys(a: np.ndarray) -> np.ndarray:
    """View the first 3 columns as a structured key per row (cast to f64:
    a f32 view over the 24-byte struct would raise an opaque ValueError)."""
    xyz = np.ascontiguousarray(a[:, :3], np.float64)
    return xyz.view([("x", float), ("y", float), ("z", float)]).reshape(-1)


def combine_rooms(room1: np.ndarray, room2: np.ndarray) -> np.ndarray:
    """Fuse one room's two dumps at co-located points.

    Returns rows ``[xyz, rni, pred, gt]`` for every exact-XYZ co-location
    (sorted by xyz key — deterministic; the reference's set() iteration
    order was not).
    """
    if room1.ndim == 1:
        room1 = room1[None]
    if room2.ndim == 1:
        room2 = room2[None]
    k1, k2 = _xyz_keys(room1), _xyz_keys(room2)
    common, i1, i2 = np.intersect1d(k1, k2, return_indices=True)
    r1, r2 = room1[i1], room2[i2]
    pred1 = r1[:, 6].astype(int)
    pred2 = r2[:, 6].astype(int)
    rows = np.arange(len(r1))
    n_prob = r1.shape[1] - 8
    # UNCLASSIFIED(31) predictions (confidence-thresholded by eval) have
    # no probability column — give them prob 0 so they always LOSE the
    # fusion vote (a confident prediction from the other scale wins)
    in1 = (pred1 >= 0) & (pred1 < n_prob)
    in2 = (pred2 >= 0) & (pred2 < n_prob)
    prob1 = np.where(in1, r1[rows, 8 + np.where(in1, pred1, 0)], 0.0)
    prob2 = np.where(in2, r2[rows, 8 + np.where(in2, pred2, 0)], 0.0)
    pred = np.where(
        pred1 == pred2, pred1, np.where(prob1 >= prob2, pred1, pred2)
    )
    return np.column_stack([r1[:, :6], pred, r1[:, 7]])


def combine_dirs(
    path1: str,
    path2: str,
    out_dir: str,
    test_area: str = "1",
    already_probs: bool = False,
) -> list[str]:
    """Fuse every co-numbered room dump of two runs; writes
    ``*_pred_gt_combined.txt`` files (reference __main__ flow)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    room = 0
    while True:
        name = f"Area_{test_area}_room_{room}_pred_gt.txt"
        f1, f2 = os.path.join(path1, name), os.path.join(path2, name)
        if not (os.path.exists(f1) and os.path.exists(f2)):
            break
        r1, r2 = np.loadtxt(f1), np.loadtxt(f2)
        if not already_probs:
            r1, r2 = add_probability_columns(r1), add_probability_columns(r2)
        combined = combine_rooms(r1, r2)
        out = os.path.join(
            out_dir, f"Area_{test_area}_room_{room}_pred_gt_combined.txt"
        )
        np.savetxt(out, combined, fmt="%f")
        written.append(out)
        room += 1
    return written


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="multi-scale result fusion")
    ap.add_argument("--path1", required=True, help="run 1 dump dir (e.g. 30 m)")
    ap.add_argument("--path2", required=True, help="run 2 dump dir (e.g. 50 m)")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--test_area", default="1")
    a = ap.parse_args()
    for p in combine_dirs(a.path1, a.path2, a.out_dir, a.test_area):
        print(p)
