"""Unified point-cloud loading with the features.json column contract.

Reference: ``load_pointcloud`` dispatch + noise filter
(/root/reference/prepare_data/process_data.py:96-123) and the LAS/HDF5
readers (:17-94). The ``features`` dict maps feature name → output column
(params/features.json uses capitalised keys X/Y/Z/AGL/Class; the loaders
accept any case).
"""

from __future__ import annotations

import sys

import numpy as np

from dgcnn_tpu.io.h5 import read_h5_pointcloud
from dgcnn_tpu.io.las import read_las
from dgcnn_tpu.prepare.noise import filter_noise


def _norm_features(features: dict[str, int]) -> dict[str, int]:
    return {k.lower(): int(v) for k, v in features.items()}


def load_pointcloud(
    filename: str,
    features_output: list[str] | None = None,
    features: dict[str, int] | None = None,
    filter_noise_points: bool = True,
    max_nn_dist: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Load a .las or .h5 cloud into an (N, F) matrix + labels.

    Columns follow the ``features`` map (x/y/z mandatory); unknown
    requested features are skipped, the 'agl' column (if mapped) is
    zero-filled unless present in the file, matching the reference's
    implicit behaviour (it allocates zeros and fills what it finds).
    """
    features = _norm_features(features or {"x": 0, "y": 1, "z": 2})
    features_output = [f.lower() for f in (features_output or list(features))]
    for c in ("x", "y", "z"):
        if c not in features:
            raise ValueError("No position found in pointcloud! "
                             f"(features map missing {c!r})")

    ext = filename.rsplit(".", 1)[-1].lower()
    if ext == "las":
        # fused native fast path: decode + noise filter + compacted
        # matrix assembly in one libdtmgen call (byte-equal to the chain
        # below — tests/test_las_io.py); None → fall through
        from dgcnn_tpu.io.las import load_las_matrix

        fused = load_las_matrix(
            filename, features, features_output,
            filter_noise_points=filter_noise_points,
            max_nn_dist=max_nn_dist,
        )
        if fused is not None:
            data, labels, dropped = fused
            if dropped:
                print(f"Filtered {dropped} noise points", file=sys.stderr)
            return data, labels
    if ext == "h5":
        raw = read_h5_pointcloud(filename)
        n = len(raw["position"])
        cols: dict[str, np.ndarray] = {
            "x": raw["position"][:, 0],
            "y": raw["position"][:, 1],
            "z": raw["position"][:, 2],
        }
        labels = np.asarray(raw["classification"]).astype(np.int64)
        for name in ("agl", "intensity", "return_number",
                     "number_of_returns"):
            if name in raw:
                cols[name] = np.asarray(raw[name]).reshape(-1)
        if "color" in raw:
            color = np.asarray(raw["color"])
            if color.ndim == 2 and color.shape[1] == 3:
                cols["red"], cols["green"], cols["blue"] = color.T
    elif ext == "las":
        las = read_las(filename)
        n = len(las)
        cols = {"x": las.x, "y": las.y, "z": las.z}
        labels = las.classification.astype(np.int64)
        for name in ("intensity", "return_number", "number_of_returns",
                     "red", "green", "blue"):
            v = las.field(name)
            if v is not None:
                cols[name] = v
    else:
        raise ValueError(f"Unsupported file type: .{ext}")

    width = max(features[f] for f in features) + 1
    data = np.zeros((n, width), np.float64)
    for name in features_output:
        if name in features and (name in cols or name == "agl"):
            data[:, features[name]] = cols.get(name, 0.0)
    for c in ("x", "y", "z"):
        data[:, features[c]] = cols[c]

    if filter_noise_points:
        keep = filter_noise(
            np.stack([cols["x"], cols["y"], cols["z"]], 1), max_nn_dist
        )
        dropped = int((~keep).sum())
        if dropped:
            # diagnostic → stderr: stdout is reserved for machine-readable
            # output in some callers (bench.py's one-JSON-line contract)
            print(f"Filtered {dropped} noise points", file=sys.stderr)
        data = data[keep]
        labels = labels[keep]
    return data, labels
