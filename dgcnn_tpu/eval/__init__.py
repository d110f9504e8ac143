"""Evaluation and whole-cloud prediction drivers."""

from dgcnn_tpu.eval.test import test
from dgcnn_tpu.eval.predict import predict

__all__ = ["test", "predict"]
