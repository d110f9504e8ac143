"""Class-label remapping via the class_map.json contract.

Reference: ``convert_pc_labels`` (/root/reference/prepare_data/
process_data.py:322-348): points whose raw LAS class is absent from the map
are dropped; the rest are remapped to contiguous training labels. The
reference remaps in-place class-by-class (which can chain-remap when map
keys overlap map values); here a lookup table applies the whole map at
once — the intended one-shot semantics.
"""

from __future__ import annotations

import json

import numpy as np


def load_class_map(path: str) -> dict[int, int]:
    """Load params/class_map.json ({raw LAS class: training label})."""
    with open(path) as f:
        raw = json.load(f)
    return {int(k): int(v) for k, v in raw.items()}


def convert_pc_labels(
    data: np.ndarray,
    labels: np.ndarray,
    class_map: dict[int, int],
) -> tuple[np.ndarray, np.ndarray]:
    """Drop unmapped-class points and remap the rest.

    Returns (data_kept, labels_remapped).
    """
    labels = np.asarray(labels).astype(np.int64).reshape(-1)
    max_key = max(list(class_map.keys()) + [0])
    lut = np.full(max_key + 2, -1, np.int64)
    for k, v in class_map.items():
        lut[k] = v
    safe = np.clip(labels, 0, max_key + 1)
    mapped = np.where(labels == safe, lut[safe], -1)
    keep = mapped >= 0
    return data[keep], mapped[keep].astype(np.int32)
