"""Weight-only quantization: INT8 and packed INT4 linear layers.

North-star extension beyond the reference (BASELINE.json: "weight-only
INT8/INT4 projections"); no reference analog exists.  Symmetric per-output-
channel scales; dequantization happens at matmul time in the activation dtype
so XLA fuses it into the MXU feed (on TPU the dequant is a cheap VPU
multiply on the weight tile as it streams from HBM — halving/quartering HBM
traffic is the win, compute stays bf16).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """int8 (or nibble-packed int4) payload + per-channel fp32 scales."""

    values: jax.Array  # int8 [in, out] (int4: [in, ceil(out/2)] packed)
    scales: jax.Array  # f32 [out]
    bits: int  # 8 or 4
    out_features: int

    def tree_flatten(self):
        return (self.values, self.scales), (self.bits, self.out_features)

    @classmethod
    def tree_unflatten(cls, aux, children):
        values, scales = children
        return cls(values, scales, aux[0], aux[1])


def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel int8: w ~= values * scales."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / 127.0)
    values = jnp.clip(jnp.round(w32 / scales), -127, 127).astype(jnp.int8)
    return QuantizedTensor(values, scales, 8, w.shape[-1])


def quantize_int4(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel int4, two values per int8 byte.

    Packing is along the OUT dim: byte j holds columns 2j (low nibble) and
    2j+1 (high nibble), offset-binary [-8, 7].
    """
    w32 = w.astype(jnp.float32)
    out = w.shape[-1]
    if out % 2:
        raise ValueError("int4 packing requires an even out dim")
    amax = jnp.max(jnp.abs(w32), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(w32 / scales), -8, 7).astype(jnp.int8)
    lo = q[:, 0::2] & 0x0F
    hi = (q[:, 1::2] & 0x0F) << 4
    return QuantizedTensor((lo | hi).astype(jnp.int8), scales, 4, out)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    if qt.bits == 8:
        w = qt.values.astype(jnp.float32)
    elif qt.bits == 4:
        packed = qt.values
        # sign-extend 4-bit two's complement from each nibble
        lo = ((packed & 0x0F) ^ 0x08).astype(jnp.int8) - 8
        hi = (((packed >> 4) & 0x0F) ^ 0x08).astype(jnp.int8) - 8
        w = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], qt.out_features)
        w = w.astype(jnp.float32)
    else:
        raise ValueError(f"unsupported bits {qt.bits}")
    return (w * qt.scales).astype(dtype)


def quantized_matmul(
    x: jax.Array, qt: QuantizedTensor, *, bias: jax.Array | None = None
) -> jax.Array:
    """x @ dequant(w) (+ bias).  XLA fuses the dequant into the matmul feed."""
    w = dequantize(qt, dtype=x.dtype)
    y = x @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


_QUANT_KEYS = ("wqkv", "wo", "wfc", "wproj")
# Llama projection names (models/llama.py param tree)
_LLAMA_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head")


def quantize_params(params: Any, keys: tuple[str, ...], *, bits: int = 8) -> Any:
    """Quantize the named projection matrices in a params pytree (weight-only).

    Embeddings / norms / biases stay fp32 (standard practice; they are a
    small fraction of bytes).
    """
    quantize = quantize_int8 if bits == 8 else quantize_int4

    def visit(tree):
        if isinstance(tree, dict):
            return {
                k: (quantize(v) if k in keys else visit(v))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [visit(t) for t in tree]
        return tree

    return visit(params)


def quantize_gpt_params(params: Any, *, bits: int = 8) -> Any:
    return quantize_params(params, _QUANT_KEYS, bits=bits)


def quantize_llama_params(params: Any, *, bits: int = 8) -> Any:
    return quantize_params(params, _LLAMA_QUANT_KEYS, bits=bits)


def gpt_forward_quantized(params, idx, cfg, **kwargs):
    """GPT forward where projection weights may be QuantizedTensors.

    Works by materializing dequantized weights per layer on the fly; memory
    win is in weight storage/HBM traffic, compute unchanged.
    """
    from ..models import gpt

    def deq(tree):
        if isinstance(tree, QuantizedTensor):
            return dequantize(tree, dtype=cfg.dtype)
        if isinstance(tree, dict):
            return {k: deq(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [deq(t) for t in tree]
        return tree

    return gpt.forward(deq(params), idx, cfg, **kwargs)
