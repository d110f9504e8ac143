"""Offline data preparation: loading, noise filtering, tiling, DTM/AGL,
class remapping, dataset assembly (reference prepare_data/ capabilities)."""

from dgcnn_tpu.prepare.blocks import room2blocks, sample_data, sample_data_label
from dgcnn_tpu.prepare.labels import convert_pc_labels, load_class_map
from dgcnn_tpu.prepare.noise import filter_noise
from dgcnn_tpu.prepare.loaders import load_pointcloud

__all__ = [
    "room2blocks",
    "sample_data",
    "sample_data_label",
    "convert_pc_labels",
    "load_class_map",
    "filter_noise",
    "load_pointcloud",
]
