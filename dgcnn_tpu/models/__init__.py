"""Model families. Currently: DGCNN semantic segmentation (the reference's
only architecture, /root/reference/model.py:85-193)."""

from dgcnn_tpu.models.dgcnn import (
    DGCNN,
    DGCNNConfig,
    init_dgcnn,
    apply_dgcnn,
    count_parameters,
)

__all__ = ["DGCNN", "DGCNNConfig", "init_dgcnn", "apply_dgcnn", "count_parameters"]
