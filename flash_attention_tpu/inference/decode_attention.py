"""Decode-step attention: one new token per slot against the KV cache.

Decode attention is HBM-bandwidth-bound (each step streams the whole cache
once for a rank-1 q), so the implementation is a fused XLA einsum with length
masking — the MXU has nothing to chew on at q_len=1, and XLA already emits a
single pass over the cache.  Quantized caches dequantize inline via the
per-token scales folded into the score/weight tensors (the same folding the
Pallas quant kernel uses), which keeps the HBM read at 1 byte/elem — the
actual win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.vanilla import DEFAULT_MASK_VALUE
from .kv_cache import KVCache


def decode_attention(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """q: [slots, q_heads, head_dim] (one token per slot) -> same shape.

    Each slot attends to its first `lengths[slot] + 1` cache entries — the
    +1 is the current token, which the caller has already written at
    position lengths[slot] via decode_write.
    """
    s, hq, d = q.shape
    hkv = cache.k.shape[2]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5

    k, v = cache.k[layer], cache.v[layer]  # [S, Hkv, L, D] payloads
    q4 = q.reshape(s, hkv, group, d)

    scores = jnp.einsum(
        "shgd,shld->shgl", q4, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if cache.quantized:
        # fold K dequant scale per cached token (column of scores)
        scores = scores * cache.k_scale[layer][:, :, None, :]

    valid = (
        jnp.arange(cache.max_len)[None, :] <= cache.lengths[:, None]
    )  # [S, L]
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    p = jax.nn.softmax(scores, axis=-1)
    if cache.quantized:
        p = p * cache.v_scale[layer][:, :, None, :]
    out = jnp.einsum(
        "shgl,shld->shgd", p.astype(q.dtype), v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s, hq, d).astype(q.dtype)
