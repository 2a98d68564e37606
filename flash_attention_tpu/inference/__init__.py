"""Inference engine: KV cache, prefill/decode, continuous batching.

North-star extension (SURVEY.md §7 stage 6); no reference analog.
"""

from .decode_attention import decode_attention
from .engine import InferenceEngine, Request
from .kv_cache import (
    KVCache,
    advance_lengths,
    decode_write,
    init_cache,
    layer_kv,
    prefill_write,
    set_length,
)
from .model_runner import decode_step, prefill
from .sampling import sample

__all__ = [
    "InferenceEngine",
    "KVCache",
    "Request",
    "advance_lengths",
    "decode_attention",
    "decode_step",
    "decode_write",
    "init_cache",
    "layer_kv",
    "prefill",
    "prefill_write",
    "sample",
    "set_length",
]
