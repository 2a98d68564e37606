"""Quantization tests: weight-only INT8/INT4 round trips + quantized-KV
attention parity against dense attention on dequantized values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.kernels import vanilla_attention
from flash_attention_tpu.models import gpt
from flash_attention_tpu.quant import (
    dequantize,
    dequantize_kv,
    flash_attention_kv_quant,
    gpt_forward_quantized,
    quantize_gpt_params,
    quantize_int4,
    quantize_int8,
    quantize_kv,
    quantized_matmul,
)


def test_int8_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    qt = quantize_int8(w)
    assert qt.values.dtype == jnp.int8
    w2 = dequantize(qt, jnp.float32)
    # per-channel max error bounded by scale/2
    err = jnp.max(jnp.abs(w - w2), axis=0)
    assert jnp.all(err <= qt.scales * 0.5 + 1e-7)


def test_int4_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    qt = quantize_int4(w)
    assert qt.values.shape == (64, 64)  # nibble-packed
    w2 = dequantize(qt, jnp.float32)
    err = jnp.max(jnp.abs(w - w2), axis=0)
    assert jnp.all(err <= qt.scales * 0.5 + 1e-7)


def test_int4_old_layout_rejected():
    """int4 packing changed from adjacent-column to split-halves; tensors
    carrying the old layout marker (e.g. unpickled round-1 checkpoints)
    must fail loudly, not dequantize to column-permuted garbage."""
    import dataclasses

    from flash_attention_tpu.quant.weights import QuantizedTensor

    w = jax.random.normal(jax.random.PRNGKey(1), (16, 32), jnp.float32)
    qt = quantize_int4(w)
    assert qt.layout == "int4-split-halves-v2"
    old = dataclasses.replace(qt, layout="int4-adjacent-v1")
    with pytest.raises(ValueError, match="int4 layout"):
        dequantize(old)
    with pytest.raises(ValueError, match="int4 layout"):
        quantized_matmul(jnp.ones((2, 16)), old)
    # int8 tensors are layout-agnostic
    q8 = dataclasses.replace(quantize_int8(w), layout="int4-adjacent-v1")
    dequantize(q8)
    # pytree roundtrip preserves the marker
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    assert jax.tree_util.tree_unflatten(treedef, leaves).layout == qt.layout


def test_quantized_matmul():
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 128), jnp.float32)
    y8 = quantized_matmul(x, quantize_int8(w))
    y = x @ w
    # int8 weight-only keeps ~2 decimal digits
    assert jnp.max(jnp.abs(y8 - y)) / jnp.max(jnp.abs(y)) < 0.02


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_kv_quant_attention_parity(dtype):
    """Quantized-KV kernel == dense attention over the dequantized KV
    (exact algorithm parity; quantization error lives in quantize_kv)."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 128), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 256, 128), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 256, 128), jnp.float32)
    kv = quantize_kv(k, v, dtype=dtype)
    out = flash_attention_kv_quant(q, kv)
    k_d, v_d = dequantize_kv(kv, jnp.float32)
    ref = vanilla_attention(q, k_d, v_d, causal=True, sm_scale=128**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_kv_quant_vs_exact():
    """End-to-end quantization error vs exact-KV attention stays small
    (int8 per-token: ~1% relative)."""
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 256, 64), jnp.float32)
    out = flash_attention_kv_quant(q, quantize_kv(k, v))
    ref = vanilla_attention(q, k, v, causal=True, sm_scale=64**-0.5)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel


def test_kv_quant_gqa_decode_shape():
    """Decode-style: short q against long quantized cache, GQA."""
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (2, 8, 128, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, 2, 512, 64), jnp.float32)
    v = jax.random.normal(ks[2], (2, 2, 512, 64), jnp.float32)
    kv = quantize_kv(k, v)
    out = flash_attention_kv_quant(q, kv)
    k_d, v_d = dequantize_kv(kv, jnp.float32)
    ref = vanilla_attention(
        q, jnp.repeat(k_d, 4, 1), jnp.repeat(v_d, 4, 1), causal=True, sm_scale=64**-0.5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_quantized_gpt_forward():
    cfg = gpt.GPTConfig(
        vocab_size=64, block_size=128, n_layer=2, n_head=2, n_embd=64,
        dropout=0.0, dtype=jnp.float32,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 64)
    ref = gpt.forward(params, idx, cfg)
    q8 = quantize_gpt_params(params, bits=8)
    out8 = gpt_forward_quantized(q8, idx, cfg)
    # logits shift a little under int8 weights but stay close
    assert jnp.max(jnp.abs(out8 - ref)) < 0.15
    q4 = quantize_gpt_params(params, bits=4)
    out4 = gpt_forward_quantized(q4, idx, cfg)
    assert jnp.max(jnp.abs(out4 - ref)) < 1.5
    assert jnp.all(jnp.isfinite(out4))


@pytest.mark.parametrize("window", [None, 100])
def test_kv_quant_window_segments_parity(window):
    """Quant kernel with sliding window / segment ids == dense attention on
    the dequantized KV with the same masks (compact causal grid path)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    b, h, l, d = 1, 2, 384, 128
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    segs = jnp.asarray(
        np.repeat(np.arange(3), l // 3)[None, :], jnp.int32
    )  # three packed docs
    kv = quantize_kv(k, v, dtype=jnp.int8)
    k_d, v_d = dequantize_kv(kv, dtype=jnp.float32)
    out = flash_attention_kv_quant(
        q, kv, causal=True, window=window, segment_ids=segs,
    )
    ref = vanilla_attention(
        q, k_d, v_d, causal=True, sm_scale=d**-0.5, window=window,
        segment_ids=(segs, segs),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_kv_quant_gqa_prefill_parity():
    """GQA (group>1) through the compact causal grid of the quant kernel."""
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    b, hq, hkv, l, d = 1, 4, 2, 256, 128
    q = jax.random.normal(ks[0], (b, hq, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, l, d), jnp.float32)
    kv = quantize_kv(k, v, dtype=jnp.int8)
    k_d, v_d = dequantize_kv(kv, dtype=jnp.float32)
    out = flash_attention_kv_quant(q, kv, causal=True)
    ref = vanilla_attention(
        q,
        jnp.repeat(k_d, hq // hkv, axis=1),
        jnp.repeat(v_d, hq // hkv, axis=1),
        causal=True,
        sm_scale=d**-0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )
