"""Probability maps from prediction dumps.

Reference: /root/reference/postprocess_data/prob_map.py — loads per-room
``*_pred_gt.txt`` dumps (row layout: xyz 0:3, rni 3:6, pred 6, gt 7,
logits 8:), softmaxes the logit columns, re-saves as ``*_pred_gt_prob.txt``.
Same contract, as importable functions with a CLI (the reference hardcodes
Windows paths in module globals).
"""

from __future__ import annotations

import os

import numpy as np
from scipy.special import softmax

LOGIT_COL = 8


def add_probability_columns(result: np.ndarray) -> np.ndarray:
    """Softmax the logit columns (8:) of one room's dump rows."""
    out = np.array(result, dtype=float, copy=True)
    if out.ndim == 1:
        out = out[None]
    if out.shape[1] > LOGIT_COL:
        out[:, LOGIT_COL:] = softmax(out[:, LOGIT_COL:], axis=1)
    return out


def process_dir(
    pred_dir: str, out_dir: str, test_area: str = "1"
) -> list[str]:
    """Convert every room dump in ``pred_dir``; returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    room = 0
    while True:
        name = f"Area_{test_area}_room_{room}_pred_gt.txt"
        path = os.path.join(pred_dir, name)
        if not os.path.exists(path):
            break
        data = add_probability_columns(np.loadtxt(path))
        out = os.path.join(
            out_dir, f"Area_{test_area}_room_{room}_pred_gt_prob.txt"
        )
        np.savetxt(out, data, fmt="%f")
        written.append(out)
        room += 1
    return written


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="probability maps from dumps")
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--test_area", default="1")
    a = ap.parse_args()
    for p in process_dir(a.pred_dir, a.out_dir, a.test_area):
        print(p)
