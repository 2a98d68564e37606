"""KV cache management for autoregressive decoding.

North-star extension (SURVEY.md §7 stage 6) — the reference has no inference
engine (its demo only trains; notebook cell 37 benchmarks a forward pass).

Layout: k, v are [n_layer, kv_heads, slots, max_len, head_dim].  Heads
leading means the per-layer cache IS an identity-paged cache by pure reshape:

    k[layer].reshape(kv_heads, slots * max_len // page_size, page_size, d)

so the paged attention kernel (inference/paged_attention.py) reads it with no
copy — slot s owns contiguous pages [s*max_len/ps, (s+1)*max_len/ps).  Static
shapes throughout.  Two write paths: `prefill_write` (one slot, T tokens,
dynamic_update_slice) and `decode_write` (all slots, 1 token each, vectorized
scatter).  Optional INT8/FP8 storage: payload + per-token scales, dequantized
at attention time (fused into the kernels, not materialized).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """k, v: [n_layer, kv_heads, slots, max_len, head_dim] payloads;
    k_scale/v_scale: [n_layer, kv_heads, slots, max_len] or None;
    lengths: [slots] int32."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None
    v_scale: jax.Array | None
    lengths: jax.Array

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def slots(self) -> int:
        return self.k.shape[2]

    @property
    def kv_heads(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    n_layer: int,
    slots: int,
    kv_heads: int,
    max_len: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    quant_dtype=None,
) -> KVCache:
    shape = (n_layer, kv_heads, slots, max_len, head_dim)
    store = quant_dtype or dtype
    scales = jnp.ones(shape[:-1], jnp.float32) if quant_dtype is not None else None
    return KVCache(
        jnp.zeros(shape, store),
        jnp.zeros(shape, store),
        scales,
        scales,
        jnp.zeros((slots,), jnp.int32),
    )


def _quantize_tokens(x: jax.Array, quant_dtype):
    from ..quant.kv import quantize_tokens

    return quantize_tokens(x, quant_dtype)


def prefill_write(
    cache: KVCache,
    layer: int,
    slot: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
) -> KVCache:
    """Write a fresh prompt's K/V into one slot at position 0.

    k_new, v_new: [kv_heads, T, head_dim].
    """
    if cache.quantized:
        k_pay, k_sc = _quantize_tokens(k_new, cache.k.dtype)
        v_pay, v_sc = _quantize_tokens(v_new, cache.v.dtype)
    else:
        k_pay, v_pay = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        k_sc = v_sc = None
    zero = jnp.int32(0)
    at = (jnp.int32(layer), zero, slot, zero, zero)
    k = jax.lax.dynamic_update_slice(cache.k, k_pay[None, :, None], at)
    v = jax.lax.dynamic_update_slice(cache.v, v_pay[None, :, None], at)
    ks = vs = None
    if cache.quantized:
        at4 = (jnp.int32(layer), zero, slot, zero)
        ks = jax.lax.dynamic_update_slice(cache.k_scale, k_sc[None, :, None], at4)
        vs = jax.lax.dynamic_update_slice(cache.v_scale, v_sc[None, :, None], at4)
    return KVCache(k, v, ks, vs, cache.lengths)


def chunk_write(
    cache: KVCache,
    layer: int,
    slot: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    start: jax.Array,
) -> KVCache:
    """Write a chunk of C tokens into one slot at position `start`
    (chunked prefill: k_new/v_new [kv_heads, C, head_dim], start traced).
    """
    if cache.quantized:
        k_pay, k_sc = _quantize_tokens(k_new, cache.k.dtype)
        v_pay, v_sc = _quantize_tokens(v_new, cache.v.dtype)
    else:
        k_pay, v_pay = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        k_sc = v_sc = None
    zero = jnp.int32(0)
    at = (jnp.int32(layer), zero, slot, jnp.int32(start), zero)
    k = jax.lax.dynamic_update_slice(cache.k, k_pay[None, :, None], at)
    v = jax.lax.dynamic_update_slice(cache.v, v_pay[None, :, None], at)
    ks = vs = None
    if cache.quantized:
        at4 = at[:-1]
        ks = jax.lax.dynamic_update_slice(cache.k_scale, k_sc[None, :, None], at4)
        vs = jax.lax.dynamic_update_slice(cache.v_scale, v_sc[None, :, None], at4)
    return KVCache(k, v, ks, vs, cache.lengths)


def decode_write(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,
    v_new: jax.Array,
    positions: jax.Array,
) -> KVCache:
    """Write one new token per slot: k_new/v_new [slots, kv_heads, head_dim],
    positions [slots].  Vectorized scatter — the decode hot path."""
    s = cache.slots
    hkv = cache.kv_heads
    hd = jnp.arange(hkv)[:, None]  # [hkv, 1]
    sl = jnp.arange(s)[None, :]  # [1, s]
    pos = positions[None, :]  # [1, s]
    if cache.quantized:
        k_pay, k_sc = _quantize_tokens(k_new, cache.k.dtype)
        v_pay, v_sc = _quantize_tokens(v_new, cache.v.dtype)
    else:
        k_pay, v_pay = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        k_sc = v_sc = None
    # [slots, kv_heads, d] -> [kv_heads, slots, d] for the scatter
    k = cache.k.at[layer, hd, sl, pos].set(jnp.swapaxes(k_pay, 0, 1))
    v = cache.v.at[layer, hd, sl, pos].set(jnp.swapaxes(v_pay, 0, 1))
    ks = vs = None
    if cache.quantized:
        ks = cache.k_scale.at[layer, hd, sl, pos].set(jnp.swapaxes(k_sc, 0, 1))
        vs = cache.v_scale.at[layer, hd, sl, pos].set(jnp.swapaxes(v_sc, 0, 1))
    return KVCache(k, v, ks, vs, cache.lengths)


def multi_write(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,
    v_new: jax.Array,
    positions: jax.Array,
) -> KVCache:
    """Write C tokens per slot in one vectorized scatter: k_new/v_new
    [slots, C, kv_heads, head_dim], positions [slots, C] (the speculative
    verify step's write path — one scatter per layer, not C)."""
    s, c, hkv, _ = k_new.shape
    hd = jnp.arange(hkv)[:, None, None]  # [hkv, 1, 1]
    sl = jnp.arange(s)[None, :, None]  # [1, s, 1]
    pos = positions[None, :, :]  # [1, s, c]
    if cache.quantized:
        k_pay, k_sc = _quantize_tokens(k_new, cache.k.dtype)
        v_pay, v_sc = _quantize_tokens(v_new, cache.v.dtype)
    else:
        k_pay, v_pay = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        k_sc = v_sc = None
    # [s, c, hkv, d] -> [hkv, s, c, d] for the scatter
    k = cache.k.at[layer, hd, sl, pos].set(k_pay.transpose(2, 0, 1, 3))
    v = cache.v.at[layer, hd, sl, pos].set(v_pay.transpose(2, 0, 1, 3))
    ks = vs = None
    if cache.quantized:
        ks = cache.k_scale.at[layer, hd, sl, pos].set(k_sc.transpose(2, 0, 1))
        vs = cache.v_scale.at[layer, hd, sl, pos].set(v_sc.transpose(2, 0, 1))
    return KVCache(k, v, ks, vs, cache.lengths)


def advance_lengths(cache: KVCache, amount) -> KVCache:
    return dataclasses.replace(cache, lengths=cache.lengths + amount)


def set_length(cache: KVCache, slot: jax.Array, length) -> KVCache:
    return dataclasses.replace(
        cache, lengths=cache.lengths.at[slot].set(length)
    )


def layer_kv(cache: KVCache, layer: int, dtype=jnp.bfloat16):
    """K, V (+scales applied) for one layer: [kv_heads, slots, max_len, d].

    For the unquantized cache this is a cheap view; quantized dequantizes
    (the fused-dequant attention paths avoid this)."""
    k, v = cache.k[layer], cache.v[layer]
    if cache.quantized:
        k = (k.astype(jnp.float32) * cache.k_scale[layer][..., None]).astype(dtype)
        v = (v.astype(jnp.float32) * cache.v_scale[layer][..., None]).astype(dtype)
    else:
        k, v = k.astype(dtype), v.astype(dtype)
    return k, v


def page_view(cache: KVCache, layer: int, page_size: int):
    """Zero-copy paged view of one layer for the paged attention kernel.

    Returns (k_pages, v_pages, k_scales, v_scales) with pages
    [kv_heads, slots * max_len/page_size, page_size, head_dim] and scales
    [kv_heads, pages, page_size] (None when unquantized)."""
    if cache.max_len % page_size:
        raise ValueError(f"max_len {cache.max_len} % page_size {page_size}")
    hkv, s, l = cache.kv_heads, cache.slots, cache.max_len
    n_pages = s * l // page_size
    d = cache.k.shape[-1]
    k_pages = cache.k[layer].reshape(hkv, n_pages, page_size, d)
    v_pages = cache.v[layer].reshape(hkv, n_pages, page_size, d)
    ks = vs = None
    if cache.quantized:
        ks = cache.k_scale[layer].reshape(hkv, n_pages, page_size)
        vs = cache.v_scale[layer].reshape(hkv, n_pages, page_size)
    return k_pages, v_pages, ks, vs


def identity_page_indices(slots: int, max_len: int, page_size: int) -> jax.Array:
    """[slots, max_len/page_size] page table for the slot-contiguous cache."""
    ppslot = max_len // page_size
    return (
        jnp.arange(slots, dtype=jnp.int32)[:, None] * ppslot
        + jnp.arange(ppslot, dtype=jnp.int32)[None, :]
    )
