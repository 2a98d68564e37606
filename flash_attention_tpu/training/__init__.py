"""Training layer: optimizer parity with the reference demo + loop."""

from .optimizer import cosine_schedule, decay_mask, make_optimizer
from .trainer import Trainer, TrainerConfig, make_eval_step, make_train_step

__all__ = [
    "Trainer",
    "TrainerConfig",
    "cosine_schedule",
    "decay_mask",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
]
