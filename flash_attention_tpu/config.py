"""Global configuration for flash-attention-tpu.

The reference (flash-attention-ipu) runs its tests on an IPUModel emulator when
no hardware is present (tests/python/test_flash_attention_qkv_packed.py:41).
Our analog is Pallas interpret mode: on non-TPU backends every kernel runs in
the Pallas interpreter so the whole suite is CPU-runnable.
"""

from __future__ import annotations

import os

import jax

_INTERPRET_OVERRIDE: bool | None = None


def set_interpret(value: bool | None) -> None:
    """Force (or un-force, with None) Pallas interpret mode globally."""
    global _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value


def use_interpret() -> bool:
    """True when Pallas kernels should run in interpreter mode.

    Defaults to interpreting on any non-TPU backend (CPU CI, tests), and
    honors the FLASH_ATTENTION_TPU_INTERPRET env var ("0"/"1").
    """
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    env = os.environ.get("FLASH_ATTENTION_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"
