"""Training/eval loops, optimizer state, schedules, checkpointing."""

from svdformer_pointsea_tpu.train.state import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    reference_lr_schedule,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "reference_lr_schedule",
]
