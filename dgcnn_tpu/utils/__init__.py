"""Cross-cutting utilities: logging, seeding, experiment dirs."""

from dgcnn_tpu.utils.logging import IOStream

__all__ = ["IOStream"]
