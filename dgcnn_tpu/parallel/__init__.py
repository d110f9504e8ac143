"""Device-mesh parallelism: data-parallel sharding and ring kNN.

The reference is single-process/single-device (SURVEY.md §2); distribution
is a first-class component of this framework: batches shard over a 'data'
mesh axis, and large point clouds can shard their point axis over a 'points'
axis with a ring all-to-all kNN (see ring_knn.py).
"""

from dgcnn_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding"]
