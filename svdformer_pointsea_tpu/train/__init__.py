"""Training/eval loops, optimizer state, schedules, checkpointing."""

from svdformer_pointsea_tpu.train.state import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_optimizer,
    reference_lr_schedule,
)
from svdformer_pointsea_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from svdformer_pointsea_tpu.train.evaluate import eval_55, eval_pcn
from svdformer_pointsea_tpu.train.infer import infer_files
from svdformer_pointsea_tpu.train.loop import (
    build_model,
    init_state,
    load_weights_into_state,
    test_net,
    train_net,
)
from svdformer_pointsea_tpu.train.convert import (
    convert_state_dict,
    load_torch_checkpoint,
)
from svdformer_pointsea_tpu.train.gan import (
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
    train_net_gan,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "reference_lr_schedule",
    "CheckpointManager",
    "restore_checkpoint",
    "save_checkpoint",
    "convert_state_dict",
    "load_torch_checkpoint",
    "eval_55",
    "eval_pcn",
    "build_model",
    "infer_files",
    "init_state",
    "load_weights_into_state",
    "test_net",
    "train_net",
    "GANTrainState",
    "create_gan_state",
    "make_gan_train_step",
    "train_net_gan",
]
