"""Training engine: trainer, optimizer, schedules, checkpointing."""

from practicaldeepstereo_nips2018_tpu.training.trainer import PDSTrainer
from practicaldeepstereo_nips2018_tpu.training.optimizer import (
    rmsprop,
    multistep_lr,
)
from practicaldeepstereo_nips2018_tpu.training import checkpoint

__all__ = ["PDSTrainer", "rmsprop", "multistep_lr", "checkpoint"]
