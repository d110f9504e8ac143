"""Feature-space visualisation: t-SNE of intermediate activations and
DBSCAN cluster export (reference visualisation.py capabilities)."""

from dgcnn_tpu.viz.features import (
    feature_tsne,
    feature_tsne_all_layers,
    generate_feature_map_clusters,
)

__all__ = [
    "feature_tsne",
    "feature_tsne_all_layers",
    "generate_feature_map_clusters",
]
