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
