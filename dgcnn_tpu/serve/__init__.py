"""Serving layer: persistent directory-watching classification service.

See :mod:`dgcnn_tpu.serve.service`; run with
``python -m dgcnn_tpu.serve --model_root ... --in_dir ... --out_dir ...``.
"""

from dgcnn_tpu.serve.service import (
    PredictService,
    serve_directory,
    start_status_server,
)

__all__ = ["PredictService", "serve_directory", "start_status_server"]
