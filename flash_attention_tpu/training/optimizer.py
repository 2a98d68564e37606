"""Optimizer construction: parity with the reference's nanoGPT trainer.

Replicates /root/reference/demo/train.py:190-224:
* AdamW with weight decay applied ONLY to tensors with >=2 dims
  (…:196-203's param grouping),
* cosine LR schedule with linear warmup (…:205-210),
* gradient clipping by global norm (nanoGPT's grad_clip=1.0).
"""

from __future__ import annotations

import jax
import optax


def cosine_schedule(
    learning_rate: float,
    warmup_iters: int,
    lr_decay_iters: int,
    min_lr: float,
) -> optax.Schedule:
    """Linear warmup then cosine decay to min_lr (demo/train.py:205-210)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=max(warmup_iters, 1),
        decay_steps=max(lr_decay_iters, warmup_iters + 1),
        end_value=min_lr,
    )


def decay_mask(params) -> object:
    """True for >=2-D tensors: decay matmul weights + embeddings, not
    biases/layernorm gains (demo/train.py:196-203 grouping)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    learning_rate: float = 3e-4,
    *,
    weight_decay: float = 0.1,
    beta1: float = 0.9,
    beta2: float = 0.95,
    grad_clip: float = 1.0,
    warmup_iters: int = 100,
    lr_decay_iters: int = 2000,
    min_lr: float | None = None,
) -> optax.GradientTransformation:
    schedule = cosine_schedule(
        learning_rate,
        warmup_iters,
        lr_decay_iters,
        min_lr if min_lr is not None else learning_rate / 10,
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=decay_mask,
        ),
    )
