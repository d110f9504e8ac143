"""Training: jitted steps, optimizers/schedules, checkpointing, the loop."""

from dgcnn_tpu.train.steps import (
    BandGuardScheduler,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    make_guarded_eval_step,
    make_guarded_predict_step,
)

__all__ = [
    "BandGuardScheduler",
    "TrainState",
    "init_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_guarded_eval_step",
    "make_guarded_predict_step",
]
