"""Functional core ops: kNN graph building, EdgeConv, losses, metrics."""

from dgcnn_tpu.ops.knn import knn, pairwise_neg_sqdist
from dgcnn_tpu.ops.edgeconv import gather_neighbors, edge_features
from dgcnn_tpu.ops.losses import smoothed_cross_entropy, masked_smoothed_cross_entropy
from dgcnn_tpu.ops.metrics import (
    confusion_matrix,
    accuracy_from_confusion,
    balanced_accuracy_from_confusion,
    iou_from_confusion,
    calculate_sem_iou,
)

__all__ = [
    "knn",
    "pairwise_neg_sqdist",
    "gather_neighbors",
    "edge_features",
    "smoothed_cross_entropy",
    "masked_smoothed_cross_entropy",
    "confusion_matrix",
    "accuracy_from_confusion",
    "balanced_accuracy_from_confusion",
    "iou_from_confusion",
    "calculate_sem_iou",
]
