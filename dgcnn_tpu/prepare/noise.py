"""Isolated-point noise filter.

Reference: KDTree 2-NN over the full cloud, dropping points whose nearest
neighbour is >= 1.0 m away (/root/reference/prepare_data/
process_data.py:115-121). Implemented with scipy's cKDTree (C, multi-core
via ``workers=-1``).
"""

from __future__ import annotations

import numpy as np


def filter_noise(
    xyz: np.ndarray, max_nn_dist: float = 1.0
) -> np.ndarray:
    """Boolean keep-mask: True where the nearest other point is closer than
    ``max_nn_dist``.

    Fast path: the native grid-hash kernel (native/dtmgen — exact, O(n),
    ~10x the single-core KDTree at 400k points). scipy fallback."""
    if len(xyz) < 2:
        return np.ones(len(xyz), bool)
    from dgcnn_tpu.prepare.dtm import native_noise_mask

    keep = native_noise_mask(xyz[:, :3], max_nn_dist)
    if keep is not None:
        return keep
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz[:, :3])
    dists, _ = tree.query(xyz[:, :3], k=2, workers=-1)
    return dists[:, 1] < max_nn_dist
