from sdeflow_tpu.training.train import (
    TrainState,
    make_train_step,
    make_eval_step,
    Trainer,
)
from sdeflow_tpu.training.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "save_checkpoint",
    "load_checkpoint",
]
