"""dgcnn_tpu — TPU-native airborne-LiDAR semantic-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``BenCurran98/AHN3-dgcnn.pytorch`` (DGCNN/EdgeConv semantic segmentation of
LiDAR point clouds): LAS/HDF5 ingestion, DTM/AGL computation, spatial tiling
and class-balanced subsampling, training/evaluation/whole-cloud prediction,
post-processing and feature visualisation — redesigned TPU-first:

* fixed static shapes, ``(B, N, C)`` channels-last layout (points on
  sublanes, channels on lanes → MXU-friendly matmuls),
* pure-functional model with explicit parameter/batch-stat pytrees,
* jit-compiled train/eval steps, ``shard_map`` data parallelism and a
  ring-kNN point-axis sharding for whole-tile inference,
* Pallas kernels for the kNN hot path,
* a native C++ ``dtmgen`` ground-extraction component (the reference shells
  out to a proprietary ``DTMGeneration`` binary; see ``native/dtmgen``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (keep `import dgcnn_tpu` light)."""
    if name in ("DGCNN", "DGCNNConfig", "init_dgcnn", "apply_dgcnn"):
        import dgcnn_tpu.models.dgcnn as m

        return getattr(m, name)
    if name in ("knn",):
        from dgcnn_tpu.ops.knn import knn

        return knn
    if name in ("knn_pallas",):
        from dgcnn_tpu.kernels.knn_pallas import knn_pallas

        return knn_pallas
    if name in ("FugroDataset", "collate_pcs"):
        import dgcnn_tpu.data.dataset as d

        return getattr(d, name)
    if name in ("train",):
        from dgcnn_tpu.train.loop import train

        return train
    if name in ("test", "predict"):
        import dgcnn_tpu.eval as e

        return getattr(e, name)
    raise AttributeError(f"module 'dgcnn_tpu' has no attribute {name!r}")
