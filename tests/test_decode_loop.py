"""decode_loop (scan-based on-device generation) must match the step-by-step
decode path exactly."""

import pytest
import jax
import jax.numpy as jnp

from flash_attention_tpu.inference import init_cache
from flash_attention_tpu.inference.model_runner import decode_loop, decode_step, prefill
from flash_attention_tpu.models import gpt

CFG = gpt.GPTConfig(
    vocab_size=64, block_size=128, n_layer=2, n_head=2, n_embd=64,
    dropout=0.0, dtype=jnp.float32,
)


def test_decode_loop_matches_stepwise():
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG.n_layer, 2, CFG.kv_heads, 128, CFG.head_dim, dtype=CFG.dtype)
    prompt = jnp.asarray([1, 2, 3, 4], jnp.int32)
    cache, logits = prefill(params, prompt, CFG, cache, jnp.int32(0))
    cache, _ = prefill(params, prompt, CFG, cache, jnp.int32(1))
    first = jnp.full((2,), int(jnp.argmax(logits)), jnp.int32)

    # stepwise
    c1, toks1 = cache, []
    t = first
    for _ in range(5):
        c1, lg = decode_step(params, t, CFG, c1)
        t = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        toks1.append(t)
    toks1 = jnp.stack(toks1)

    # scan loop
    c2, toks2 = decode_loop(params, CFG, cache, first, 5)
    assert (toks1 == toks2).all(), (toks1, toks2)
    assert (c1.lengths == c2.lengths).all()


@pytest.mark.slow
def test_decode_attention_fused_matches_einsum():
    """Fused-heads slot-major kernel vs the einsum reference across MHA/GQA,
    head_dim 64/128, bf16/int8 caches and ragged lengths."""
    import dataclasses

    from flash_attention_tpu.inference import kv_cache as kvc
    from flash_attention_tpu.inference.decode_attention import (
        decode_attention, decode_attention_fused,
    )

    for hq, hkv, d, quant in [
        (12, 12, 64, None),
        (12, 12, 64, jnp.int8),
        (8, 8, 128, None),
        (8, 2, 128, jnp.int8),
        (8, 4, 64, jnp.int8),
    ]:
        s, ll = 4, 256
        cache = init_cache(2, s, hkv, ll, d, dtype=jnp.bfloat16, quant_dtype=quant)
        for t in range(130):
            kt = jax.random.normal(jax.random.PRNGKey(100 + t), (s, hkv, d), jnp.bfloat16)
            vt = jax.random.normal(jax.random.PRNGKey(200 + t), (s, hkv, d), jnp.bfloat16)
            cache = kvc.decode_write(cache, 1, kt, vt, jnp.full((s,), t, jnp.int32))
        cache = dataclasses.replace(
            cache, lengths=jnp.asarray([129, 64, 1, 127], jnp.int32)
        )
        q = jax.random.normal(jax.random.PRNGKey(7), (s, hq, d), jnp.bfloat16)
        ref = decode_attention(q, cache, 1)
        out = decode_attention_fused(q, cache, 1, block=128)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        assert err <= 3e-2, (hq, hkv, d, quant, err)


def test_decode_attention_chunked_matches_einsum():
    """Chunked (<=64-slot static chunks, the S>64 XLA-cliff workaround) vs
    the plain einsum, incl. a ragged tail chunk and an int8 cache."""
    import dataclasses

    from flash_attention_tpu.inference import kv_cache as kvc
    from flash_attention_tpu.inference.decode_attention import (
        decode_attention, decode_attention_chunked,
    )

    for hq, hkv, d, quant, s in [
        (12, 12, 64, None, 96),      # ragged tail: 64 + 32
        (8, 2, 64, jnp.int8, 128),   # GQA, two full chunks, quantized
        (4, 4, 64, None, 8),         # below chunk -> plain einsum fallback
    ]:
        ll = 128
        cache = init_cache(2, s, hkv, ll, d, dtype=jnp.bfloat16, quant_dtype=quant)
        for t in range(70):
            kt = jax.random.normal(jax.random.PRNGKey(300 + t), (s, hkv, d), jnp.bfloat16)
            vt = jax.random.normal(jax.random.PRNGKey(400 + t), (s, hkv, d), jnp.bfloat16)
            cache = kvc.decode_write(cache, 1, kt, vt, jnp.full((s,), t, jnp.int32))
        lengths = (jnp.arange(s, dtype=jnp.int32) * 13) % 70
        cache = dataclasses.replace(cache, lengths=lengths)
        q = jax.random.normal(jax.random.PRNGKey(9), (s, hq, d), jnp.bfloat16)
        ref = decode_attention(q, cache, 1)
        out = decode_attention_chunked(q, cache, 1, chunk=64)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        assert err <= 2e-2, (hq, hkv, d, quant, s, err)


def test_decode_loop_fused_impl_matches_einsum_impl():
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG.n_layer, 2, CFG.kv_heads, 128, CFG.head_dim, dtype=CFG.dtype)
    prompt = jnp.asarray([1, 2, 3, 4], jnp.int32)
    cache, logits = prefill(params, prompt, CFG, cache, jnp.int32(0))
    cache, _ = prefill(params, prompt, CFG, cache, jnp.int32(1))
    first = jnp.full((2,), int(jnp.argmax(logits)), jnp.int32)
    _, toks_e = decode_loop(params, CFG, cache, first, 5, attn_impl="einsum")
    _, toks_f = decode_loop(params, CFG, cache, first, 5, attn_impl="fused")
    assert (toks_e == toks_f).all(), (toks_e, toks_f)
