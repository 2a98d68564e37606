"""flash-attention-tpu: a TPU-native attention-centric framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
graphcore-research/flash-attention-ipu (see SURVEY.md for the layer map).
Public API mirrors the reference's surface
(/root/reference/flash_attention_ipu/__init__.py:25-26) plus TPU-native
extensions (sharding, quantization, inference engine).
"""

from .kernels import (
    BlockSizes,
    flash_attention,
    flash_attention_with_lse,
    vanilla_attention,
)
from .ops import dot_product_attention, flash_attention_qkv_packed

__version__ = "0.1.0"

__all__ = [
    "BlockSizes",
    "dot_product_attention",
    "flash_attention",
    "flash_attention_with_lse",
    "flash_attention_qkv_packed",
    "vanilla_attention",
    "__version__",
]
