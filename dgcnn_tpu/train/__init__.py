"""Training: jitted steps, optimizers/schedules, checkpointing, the loop."""

from dgcnn_tpu.train.steps import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "TrainState",
    "init_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
]
