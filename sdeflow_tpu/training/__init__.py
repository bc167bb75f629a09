from sdeflow_tpu.training.train import (
    TrainState,
    make_train_step,
    make_eval_step,
    build_optimizer,
    Trainer,
)
from sdeflow_tpu.training.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "build_optimizer",
    "Trainer",
    "save_checkpoint",
    "load_checkpoint",
]
