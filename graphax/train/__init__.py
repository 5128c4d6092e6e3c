"""graphax.train — typed config, optimizers, training loops, presets,
checkpoints, run statistics."""

from graphax.train.config import Config
from graphax.train.optimizers import get_optimizer
from graphax.train.loop import Trainer, TrainState, Meter, add_labels, \
    get_label_masks, cross_entropy_loss
from graphax.train.presets import BEST_PARAMS, best_config
from graphax.train.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "Config", "get_optimizer", "Trainer", "TrainState", "Meter",
    "add_labels", "get_label_masks", "cross_entropy_loss",
    "BEST_PARAMS", "best_config", "save_checkpoint", "load_checkpoint",
]
