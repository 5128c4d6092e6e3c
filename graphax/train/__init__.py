"""graphax.train — typed config, optimizers, training loops, sweeps, stats."""

from graphax.train.config import Config

__all__ = ["Config"]
