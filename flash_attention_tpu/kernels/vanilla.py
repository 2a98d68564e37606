"""Dense ("vanilla") attention reference in pure jnp.

TPU-native analog of the reference's vanillaAttention / vanillaAttentionGrad
(/root/reference/flash_attention_ipu/cpp/vanilla_attention.cpp:33-124): a
non-chunked causal attention used as numerical ground truth for kernel parity
tests and as the dense fallback path for shapes too small/unaligned for the
Pallas kernel (the role of the CPU fallback at
/root/reference/flash_attention_ipu/_impl/flash_attention_qkv_packed.py:47-53).

Unlike the reference we do not build a -10000 additive triu mask; we mask with
a large-magnitude finite value in fp32 and compute the softmax statistics in
fp32 regardless of input dtype, which is the numerically honest TPU approach
(bf16 inputs, fp32 accumulation on the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# -0.7 * fp32_max instead of -inf: exp(-inf - (-inf)) = NaN, and XLA constant
# folds -inf arithmetic in surprising ways.  Same choice as the JAX TPU flash
# attention kernels.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _causal_mask(
    q_len: int, kv_len: int, window: int | None = None
) -> jax.Array:
    """[q_len, kv_len] bool mask; True = attend.

    Query positions are aligned to the *end* of the KV sequence (the standard
    decode convention): q row i has absolute position i + kv_len - q_len.
    With `window`, only the last `window` positions (incl. self) attend.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    mask = col <= row + (kv_len - q_len)
    if window is not None:
        mask = mask & (col >= row + (kv_len - q_len) - (window - 1))
    return mask


def vanilla_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float = 1.0,
    window: int | None = None,
    segment_ids=None,
) -> tuple[jax.Array, jax.Array]:
    """Dense attention returning (out, logsumexp).

    Shapes: q [..., q_len, d], k/v [..., kv_len, d] with matching batch dims.
    segment_ids: optional (q_ids [B, q_len], kv_ids [B, kv_len]) for packed
    sequences (assumes leading batch dim B and a head dim).
    Softmax statistics in fp32; output cast back to q.dtype.
    """
    q_len, kv_len = q.shape[-2], k.shape[-2]
    # fp32 inputs get full-precision MXU passes: the default truncated mode
    # would leave ~2e-2 error on hardware, making this useless as a 1e-5
    # ground truth (reference parity tiers, tests/cpp:245-287).
    precision = (
        jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    )
    s = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32,
        precision=precision,
    )
    s = s * sm_scale
    if causal:
        mask = _causal_mask(q_len, kv_len, window)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    if segment_ids is not None:
        q_ids, kv_ids = segment_ids
        seg = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
        s = jnp.where(seg, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse = (m + jnp.log(l))[..., 0]
    out = jnp.einsum(
        "...qk,...kd->...qd",
        (p / l).astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(q.dtype), lse


def vanilla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float = 1.0,
    window: int | None = None,
    segment_ids=None,
) -> jax.Array:
    """Dense attention (differentiable via plain XLA autodiff)."""
    out, _ = vanilla_attention_with_lse(
        q, k, v, causal=causal, sm_scale=sm_scale, window=window,
        segment_ids=segment_ids,
    )
    return out
