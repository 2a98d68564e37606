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
    hkv = cache.kv_heads
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5

    k, v = cache.k[layer], cache.v[layer]  # [Hkv, S, L, D] payloads
    q4 = q.reshape(s, hkv, group, d)

    scores = jnp.einsum(
        "shgd,hsld->shgl", q4, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if cache.quantized:
        # fold K dequant scale per cached token (column of scores)
        scores = scores * jnp.swapaxes(cache.k_scale[layer], 0, 1)[:, :, None, :]

    valid = (
        jnp.arange(cache.max_len)[None, :] <= cache.lengths[:, None]
    )  # [S, L]
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    p = jax.nn.softmax(scores, axis=-1)
    if cache.quantized:
        p = p * jnp.swapaxes(cache.v_scale[layer], 0, 1)[:, :, None, :]
    out = jnp.einsum(
        "shgl,hsld->shgd", p.astype(q.dtype), v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s, hq, d).astype(q.dtype)


def decode_attention_paged(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    page_size: int = 128,
    sm_scale: float | None = None,
    pages_per_compute_block: int = 8,
) -> jax.Array:
    """Decode attention through the paged Pallas kernel (zero-copy page view
    of the slot cache).  Reads only pages up to each slot's length and
    streams quantized payloads at 1 byte/elem — the production decode path.

    Small head dims (64, 32, ...) are lane-packed into 128-wide page rows
    inside paged_attention (Mosaic page-DMA alignment); head dims that
    neither divide nor are a multiple of 128 fall back to the einsum path.
    """
    from . import kv_cache as kvc
    from .paged_attention import paged_attention

    d = q.shape[-1]
    if d % 128 and (128 % d or page_size % (128 // max(d, 1))):
        return decode_attention(q, cache, layer, sm_scale=sm_scale)

    kp, vp, ks, vs = kvc.page_view(cache, layer, page_size)
    pi = kvc.identity_page_indices(cache.slots, cache.max_len, page_size)
    return paged_attention(
        q,
        kp,
        vp,
        cache.lengths + 1,  # current token already written at pos lengths
        pi,
        k_scales=ks,
        v_scales=vs,
        sm_scale=sm_scale,
        pages_per_compute_block=pages_per_compute_block,
    )
