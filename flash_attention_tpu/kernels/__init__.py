"""Kernel layer: Pallas TPU kernels + dense references.

The TPU-native analog of the reference's L0 Poplar graph-program layer
(/root/reference/flash_attention_ipu/cpp/), per SURVEY.md §1.
"""

from .autotune import autotune, autotune_for_model, tuned_blocks
from .block_sizes import BlockSizes, auto_num_chunks, blocks_from_chunks, default_blocks
from .flash_attention import flash_attention, flash_attention_with_lse
from .vanilla import vanilla_attention, vanilla_attention_with_lse

__all__ = [
    "BlockSizes",
    "auto_num_chunks",
    "autotune",
    "autotune_for_model",
    "blocks_from_chunks",
    "default_blocks",
    "tuned_blocks",
    "flash_attention",
    "flash_attention_with_lse",
    "vanilla_attention",
    "vanilla_attention_with_lse",
]
