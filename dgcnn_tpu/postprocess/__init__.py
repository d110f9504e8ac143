"""Post-processing of prediction dumps: probability maps, multi-scale
fusion, metrics, LAS export (reference postprocess_data/ + predictions.py)."""

from dgcnn_tpu.postprocess.prob_map import add_probability_columns, process_dir
from dgcnn_tpu.postprocess.combine import combine_rooms, combine_dirs
from dgcnn_tpu.postprocess.metrics import evaluate_combined_dir
from dgcnn_tpu.postprocess.las_export import predictions_to_las, export_dir

__all__ = [
    "add_probability_columns",
    "process_dir",
    "combine_rooms",
    "combine_dirs",
    "evaluate_combined_dir",
    "predictions_to_las",
    "export_dir",
]
