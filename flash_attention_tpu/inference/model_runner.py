"""GPT forward passes against a KV cache: prefill and decode.

The prefill path reuses the Pallas flash kernel (prompt tokens attend
causally within the prompt — the cache is empty for a fresh slot), writing
K/V into the cache as it goes.  The decode path runs one token per slot
through `decode_attention`.

Weight-only quantized params (QuantizedTensor leaves from the quant layer)
are supported in both paths via `_matmul`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention
from ..models.gpt import GPTConfig, _layer_norm
from ..quant.weights import QuantizedTensor, quantized_matmul
from . import kv_cache as kvc
from .decode_attention import (
    decode_attention,
    decode_attention_chunked,
    decode_attention_fused,
    decode_attention_paged,
)


def _matmul(x, w, b=None):
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w, bias=b)
    y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _qkv(x, blk, cfg: GPTConfig):
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    qkv = _matmul(x, blk["attn"]["wqkv"], blk["attn"]["bqkv"])
    return jnp.split(qkv, [h * d, (h + hkv) * d], axis=-1)


def _mlp(x, blk, cfg: GPTConfig):
    y = _matmul(x, blk["mlp"]["wfc"], blk["mlp"]["bfc"])
    y = jax.nn.gelu(y)
    return _matmul(y, blk["mlp"]["wproj"], blk["mlp"]["bproj"])


def prefill(
    params,
    tokens: jax.Array,
    cfg: GPTConfig,
    cache: kvc.KVCache,
    slot: jax.Array,
    length: jax.Array | None = None,
) -> tuple[kvc.KVCache, jax.Array]:
    """Run a prompt [T] through the model, filling `slot` of the cache.

    Returns (cache, logits [vocab] at the last REAL token).  T is static
    (bucketed by the scheduler); `length` is the true prompt length when
    the prompt is right-padded to the bucket — the returned logits come
    from position length-1 and the cache length is set to `length`, so a
    bucket-padded admission needs no correction decode step.  The slot
    must be fresh (length 0 semantics).
    """
    t = tokens.shape[0]
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    x = (params["wte"][tokens] + params["wpe"][:t]).astype(cfg.dtype)[None]
    for li, blk in enumerate(params["blocks"]):
        xa = _layer_norm(x, blk["ln1"])
        q, k, v = _qkv(xa, blk, cfg)
        q = q.reshape(1, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(1, t, hkv, d).transpose(0, 2, 1, 3)
        v = v.reshape(1, t, hkv, d).transpose(0, 2, 1, 3)
        cache = kvc.prefill_write(cache, li, slot, k[0], v[0])
        y = flash_attention(q, k, v, causal=True)
        y = y.transpose(0, 2, 1, 3).reshape(1, t, h * d)
        x = x + _matmul(y, blk["attn"]["wo"], blk["attn"]["bo"])
        x = x + _mlp(_layer_norm(x, blk["ln2"]), blk, cfg)
    x = _layer_norm(x, params["lnf"])
    if length is None:
        last = x[0, -1]
        n = t
    else:
        last = jnp.take(x[0], length - 1, axis=0)
        n = length
    logits = (last @ params["wte"].astype(x.dtype).T).astype(jnp.float32)
    cache = kvc.set_length(cache, slot, n)
    return cache, logits


def prefill_many(
    params,
    tokens: jax.Array,
    cfg: GPTConfig,
    cache: kvc.KVCache,
    slots: jax.Array,
    lengths: jax.Array,
) -> tuple[kvc.KVCache, jax.Array]:
    """Batched admission: prefill M same-bucket prompts in ONE dispatch.

    tokens [M, T] (right-padded to the shared bucket T), slots [M],
    lengths [M] true lengths.  Returns (cache, logits [M, vocab] at each
    prompt's last real token).  Motivation (measured through the axon
    tunnel): a prefill dispatch costs ~30 ms of round-trip latency, so
    admitting a burst serially taxes the engine ~30 ms x M — at 20 req/s
    that was ~half the engine's wall time; one batched dispatch pays the
    latency once and the forward batches on the MXU.
    """
    m, t = tokens.shape
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    x = (params["wte"][tokens] + params["wpe"][:t]).astype(cfg.dtype)
    for li, blk in enumerate(params["blocks"]):
        xa = _layer_norm(x, blk["ln1"])
        q, k, v = _qkv(xa, blk, cfg)
        q = q.reshape(m, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(m, t, hkv, d).transpose(0, 2, 1, 3)
        v = v.reshape(m, t, hkv, d).transpose(0, 2, 1, 3)
        for i in range(m):
            cache = kvc.prefill_write(cache, li, slots[i], k[i], v[i])
        y = flash_attention(q, k, v, causal=True)
        y = y.transpose(0, 2, 1, 3).reshape(m, t, h * d)
        x = x + _matmul(y, blk["attn"]["wo"], blk["attn"]["bo"])
        x = x + _mlp(_layer_norm(x, blk["ln2"]), blk, cfg)
    x = _layer_norm(x, params["lnf"])
    last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0]
    logits = (last @ params["wte"].astype(x.dtype).T).astype(jnp.float32)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[slots].set(lengths)
    )
    return cache, logits


def _offset_attention(q, k, v, k_scale, v_scale, starts):
    """Dense multi-token decode attention at per-slot offsets — the single
    core behind chunked prefill and the speculative verify step.

    q [S, Hq, C, D]; k/v [Hkv, S, L, D] (cache layout, possibly quantized
    with k_scale/v_scale [Hkv, S, L]); starts [S].  Row c of slot s sits
    at absolute position starts[s] + c and sees cache entries up to it.
    Scaling order matches decode_attention (fp32 scores scaled AFTER the
    matmul) so single-token decode and multi-token scoring agree to the
    rounding of the batched-vs-rank-1 matmul reductions.  Dense is the
    right tool: C x max_len scores are small and the traced offset is
    inexpressible in the static flash grid.
    """
    s, hq, c, d = q.shape
    hkv = k.shape[0]
    group = hq // hkv
    q5 = q.reshape(s, hkv, group, c, d)
    scores = jnp.einsum(
        "shgcd,hsld->shgcl", q5, k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (float(d) ** -0.5)
    if k_scale is not None:
        scores = scores * jnp.swapaxes(k_scale, 0, 1)[:, :, None, None, :]
    row = jnp.arange(c)[None, :, None]
    col = jnp.arange(k.shape[2])[None, None, :]
    visible = col <= starts[:, None, None] + row  # [S, C, L]
    from ..kernels.vanilla import DEFAULT_MASK_VALUE

    scores = jnp.where(visible[:, None, None], scores, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        p = p * jnp.swapaxes(v_scale, 0, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "shgcl,hsld->shgcd", p.astype(q.dtype), v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s, hq, c, d).astype(q.dtype)


def _chunk_attention(q, cache, layer, slot, start):
    """One-slot view of _offset_attention (chunked prefill): q [1, Hq, C, D]
    against slot `slot`'s cached prefix + itself at offset `start`."""
    take = lambda a: jnp.take(a, slot, axis=1)[:, None]  # noqa: E731
    return _offset_attention(
        q,
        take(cache.k[layer]),
        take(cache.v[layer]),
        take(cache.k_scale[layer]) if cache.quantized else None,
        take(cache.v_scale[layer]) if cache.quantized else None,
        jnp.asarray(start, jnp.int32)[None],
    )


def prefill_chunk(
    params,
    tokens: jax.Array,
    cfg: GPTConfig,
    cache: kvc.KVCache,
    slot: jax.Array,
    start: jax.Array,
    length: jax.Array | None = None,
) -> tuple[kvc.KVCache, jax.Array]:
    """Chunked prefill: process tokens [C] at positions start..start+C-1.

    Long prompts are admitted chunk by chunk (the scheduler interleaves
    chunks with decode scans, so one long prompt no longer head-of-line
    blocks every running stream — vLLM-style chunked prefill).  `start` is
    traced: one compile serves every chunk.  `length` (valid tokens in
    THIS chunk, < C only on the padded final chunk) picks the logits row
    and the cache length, exactly like `prefill`.  Caller contract: earlier
    chunks of this prompt have already been written (cache rows [0, start)).

    Returns (cache, logits [vocab] at the chunk's last real token).
    """
    c = tokens.shape[0]
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    positions = jnp.clip(start + jnp.arange(c), 0, cfg.block_size - 1)
    x = (params["wte"][tokens] + params["wpe"][positions]).astype(cfg.dtype)[None]
    for li, blk in enumerate(params["blocks"]):
        xa = _layer_norm(x, blk["ln1"])
        q, k, v = _qkv(xa, blk, cfg)
        q = q.reshape(1, c, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(1, c, hkv, d).transpose(0, 2, 1, 3)
        v = v.reshape(1, c, hkv, d).transpose(0, 2, 1, 3)
        cache = kvc.chunk_write(cache, li, slot, k[0], v[0], start)
        y = _chunk_attention(q, cache, li, slot, start)
        y = y.transpose(0, 2, 1, 3).reshape(1, c, h * d)
        x = x + _matmul(y, blk["attn"]["wo"], blk["attn"]["bo"])
        x = x + _mlp(_layer_norm(x, blk["ln2"]), blk, cfg)
    x = _layer_norm(x, params["lnf"])
    valid = jnp.int32(c) if length is None else length
    last = jnp.take(x[0], valid - 1, axis=0)
    logits = (last @ params["wte"].astype(x.dtype).T).astype(jnp.float32)
    cache = kvc.set_length(cache, slot, start + valid)
    return cache, logits


def _verify_attention(q, cache, layer, starts):
    """All-slots view of _offset_attention (speculative verify step)."""
    return _offset_attention(
        q,
        cache.k[layer],
        cache.v[layer],
        cache.k_scale[layer] if cache.quantized else None,
        cache.v_scale[layer] if cache.quantized else None,
        starts,
    )


def verify_step(
    params,
    tokens: jax.Array,
    cfg: GPTConfig,
    cache: kvc.KVCache,
) -> tuple[kvc.KVCache, jax.Array]:
    """Score C tokens per slot in ONE forward: tokens [S, C] placed at
    positions lengths[s]..lengths[s]+C-1, K/V written into the cache.

    Returns (cache, logits [S, C, vocab]) — logits at EVERY row, which is
    what speculative decoding's accept test needs.  Cache lengths are NOT
    advanced; the caller decides how many rows were accepted and sets them
    (rows past the accepted point hold garbage that later writes overwrite
    and the length mask hides).
    """
    s, c = tokens.shape
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    starts = jnp.clip(cache.lengths, 0, cache.max_len - 1)
    pos = jnp.clip(starts[:, None] + jnp.arange(c)[None, :], 0, cache.max_len - 1)
    x = (
        params["wte"][tokens]
        + params["wpe"][jnp.clip(pos, 0, cfg.block_size - 1)]
    ).astype(cfg.dtype)  # [S, C, E]
    for li, blk in enumerate(params["blocks"]):
        xa = _layer_norm(x, blk["ln1"])
        q, k, v = _qkv(xa, blk, cfg)
        q = q.reshape(s, c, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(s, c, hkv, d)
        v = v.reshape(s, c, hkv, d)
        cache = kvc.multi_write(cache, li, k, v, pos)
        y = _verify_attention(q, cache, li, starts)
        y = y.transpose(0, 2, 1, 3).reshape(s, c, h * d)
        x = x + _matmul(y, blk["attn"]["wo"], blk["attn"]["bo"])
        x = x + _mlp(_layer_norm(x, blk["ln2"]), blk, cfg)
    x = _layer_norm(x, params["lnf"])
    logits = (x @ params["wte"].astype(x.dtype).T).astype(jnp.float32)
    return cache, logits


def decode_step(
    params,
    tokens: jax.Array,
    cfg: GPTConfig,
    cache: kvc.KVCache,
    active: jax.Array | None = None,
    *,
    attn_impl: str = "einsum",
) -> tuple[kvc.KVCache, jax.Array]:
    """One decode step for every slot: tokens [slots] -> logits [slots, vocab].

    Inactive slots compute garbage (static shapes); `active` [slots] bool
    gates their length advance so stale slots don't creep; the scheduler
    discards their logits.  attn_impl: "einsum" (fused XLA pass over the
    whole cache — the default/production path: decode attention is rank-1
    and bandwidth-bound, and XLA's fused read measured faster than both
    hand kernels on v5e, see decode_attention.py), "fused" (slot-major
    Pallas kernel, length-adaptive reads + fused dequant — wins only when
    contexts are far shorter than cache capacity) or "paged" (paged-cache
    kernel).
    """
    s = cache.slots
    d, h, hkv = cfg.head_dim, cfg.n_head, cfg.kv_heads
    attend = {
        "einsum": decode_attention,
        "chunked": decode_attention_chunked,
        "paged": decode_attention_paged,
        "fused": decode_attention_fused,
    }[attn_impl]
    # Clamp to CACHE capacity (may differ from cfg.block_size), and stop
    # advancing lengths at max_len so a full slot degrades to overwriting
    # its last entry instead of silently corrupting the valid-length mask.
    # Callers must retire sequences at capacity (the engine does).
    positions = jnp.clip(cache.lengths, 0, cache.max_len - 1)
    pos_emb = params["wpe"][jnp.clip(positions, 0, cfg.block_size - 1)]
    x = (params["wte"][tokens] + pos_emb).astype(cfg.dtype)[:, None]  # [S, 1, E]
    for li, blk in enumerate(params["blocks"]):
        xa = _layer_norm(x, blk["ln1"])
        q, k, v = _qkv(xa, blk, cfg)
        q = q.reshape(s, h, d)
        k = k.reshape(s, hkv, d)
        v = v.reshape(s, hkv, d)
        cache = kvc.decode_write(cache, li, k, v, positions)
        y = attend(q, cache, li)
        x = x + _matmul(y.reshape(s, 1, h * d), blk["attn"]["wo"], blk["attn"]["bo"])
        x = x + _mlp(_layer_norm(x, blk["ln2"]), blk, cfg)
    x = _layer_norm(x, params["lnf"])
    logits = (x[:, 0] @ params["wte"].astype(x.dtype).T).astype(jnp.float32)
    step = 1 if active is None else active.astype(jnp.int32)
    step = jnp.where(cache.lengths < cache.max_len - 1, step, 0)
    cache = kvc.advance_lengths(cache, step)
    return cache, logits


def decode_loop(
    params,
    cfg: GPTConfig,
    cache: kvc.KVCache,
    first_tokens: jax.Array,
    n_steps: int,
    *,
    attn_impl: str = "einsum",
) -> tuple[kvc.KVCache, jax.Array]:
    """Fully on-device greedy decoding: `n_steps` chained decode steps under
    one lax.scan (one dispatch for the whole generation — the production
    decode path and the tokens/s benchmark kernel).

    Returns (cache, tokens [n_steps, slots])."""

    def body(carry, _):
        cache, toks = carry
        cache, logits = decode_step(
            params, toks, cfg, cache, attn_impl=attn_impl
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (cache, nxt), nxt

    (cache, _), toks = jax.lax.scan(
        body, (cache, first_tokens), None, length=n_steps
    )
    return cache, toks
