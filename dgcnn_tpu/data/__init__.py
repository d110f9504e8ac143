"""Host-side data pipeline: .npy room store, class-balanced sampling,
fixed-shape batching and device feed."""

from dgcnn_tpu.data.dataset import FugroDataset, collate, collate_pcs
from dgcnn_tpu.data.sampling import (
    class_counts,
    create_train_mask,
    sample_point_indices,
)

__all__ = [
    "FugroDataset",
    "collate",
    "collate_pcs",
    "class_counts",
    "create_train_mask",
    "sample_point_indices",
]
