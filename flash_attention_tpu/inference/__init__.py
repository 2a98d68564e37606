"""Inference engine: KV cache, prefill/decode, continuous batching.

North-star extension (SURVEY.md §7 stage 6); no reference analog.
"""

from .decode_attention import decode_attention, decode_attention_paged
from .engine import InferenceEngine, Request
from .kv_cache import (
    KVCache,
    advance_lengths,
    decode_write,
    identity_page_indices,
    init_cache,
    layer_kv,
    page_view,
    prefill_write,
    set_length,
)
from .model_runner import (
    decode_loop,
    decode_step,
    prefill,
    prefill_chunk,
    verify_step,
)
from .speculative import gather_tokens, speculative_decode_loop
from .paged_attention import paged_attention, paged_attention_ref
from .sampling import sample

__all__ = [
    "gather_tokens",
    "prefill_chunk",
    "speculative_decode_loop",
    "verify_step",
    "InferenceEngine",
    "KVCache",
    "Request",
    "advance_lengths",
    "decode_attention",
    "decode_attention_paged",
    "decode_loop",
    "decode_step",
    "decode_write",
    "identity_page_indices",
    "init_cache",
    "layer_kv",
    "page_view",
    "paged_attention",
    "paged_attention_ref",
    "prefill",
    "prefill_write",
    "sample",
    "set_length",
]
