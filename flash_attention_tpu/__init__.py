"""flash-attention-tpu: a TPU-native attention-centric framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
graphcore-research/flash-attention-ipu (see SURVEY.md for the layer map).
Public API mirrors the reference's surface
(/root/reference/flash_attention_ipu/__init__.py:25-26) plus TPU-native
extensions (sharding, quantization, inference engine).
"""

import importlib

from .kernels import (
    BlockSizes,
    flash_attention,
    flash_attention_with_lse,
    vanilla_attention,
)
from .ops import dot_product_attention, flash_attention_qkv_packed

__version__ = "0.1.0"

# Lazily importable subsystems (keeps `import flash_attention_tpu` light;
# training pulls optax, inference pulls the engine, etc.)
_SUBMODULES = (
    "kernels",
    "ops",
    "models",
    "training",
    "parallel",
    "inference",
    "quant",
    "data",
    "utils",
    "config",
)


def __getattr__(name: str):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "BlockSizes",
    "dot_product_attention",
    "flash_attention",
    "flash_attention_with_lse",
    "flash_attention_qkv_packed",
    "vanilla_attention",
    "__version__",
    *_SUBMODULES,
]
