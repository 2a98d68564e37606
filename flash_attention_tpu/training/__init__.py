"""Training layer: optimizer parity with the reference demo + loop."""

from .checkpoint import (
    enable_compilation_cache,
    latest_step_dir,
    restore_checkpoint,
    save_checkpoint,
)
from .metrics import MetricsLogger
from .optimizer import (
    cosine_schedule,
    decay_mask,
    fused_clip_adamw,
    make_optimizer,
)
from .trainer import Trainer, TrainerConfig, make_eval_step, make_train_step

__all__ = [
    "MetricsLogger",
    "Trainer",
    "TrainerConfig",
    "cosine_schedule",
    "decay_mask",
    "enable_compilation_cache",
    "fused_clip_adamw",
    "latest_step_dir",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
