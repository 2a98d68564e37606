"""Model layer: GPT-2-class transformers over the flash kernels."""

from .gpt import (
    GPT2_124M,
    SHAKESPEARE_CHAR,
    GPTConfig,
    forward,
    generate,
    init_params,
    loss_fn,
    num_params,
)

__all__ = [
    "GPT2_124M",
    "SHAKESPEARE_CHAR",
    "GPTConfig",
    "forward",
    "generate",
    "init_params",
    "loss_fn",
    "num_params",
]
