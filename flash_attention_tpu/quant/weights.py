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


# int4 packing layout identifier.  The layout changed once (adjacent-column
# nibbles -> split-halves, commit c3a461e: adjacent packing's lane interleave
# was 10x slower); serialized QuantizedTensors carry this marker so weights
# pickled under the old layout fail loudly instead of dequantizing to
# silently column-permuted garbage.
INT4_LAYOUT = "int4-split-halves-v2"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """int8 (or nibble-packed int4) payload + per-channel fp32 scales."""

    values: jax.Array  # int8 [in, out] (int4: [in, ceil(out/2)] packed)
    scales: jax.Array  # f32 [out]
    bits: int  # 8 or 4
    out_features: int
    layout: str = INT4_LAYOUT  # int4 packing format version

    def tree_flatten(self):
        return (self.values, self.scales), (
            self.bits, self.out_features, self.layout,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        values, scales = children
        # aux[2] absent on trees flattened before the layout field existed:
        # those predate the format break, so tag them with the OLD layout.
        layout = aux[2] if len(aux) > 2 else "int4-adjacent-v1"
        return cls(values, scales, aux[0], aux[1], layout)


def _check_int4_layout(qt: QuantizedTensor) -> None:
    layout = getattr(qt, "layout", "int4-adjacent-v1")
    if layout != INT4_LAYOUT:
        raise ValueError(
            f"QuantizedTensor has int4 layout {layout!r} but this build "
            f"unpacks {INT4_LAYOUT!r} (split-halves: byte j = columns j and "
            "j + out/2).  Re-quantize from the original weights with "
            "quantize_int4 — dequantizing the old adjacent-column layout "
            "here would silently permute columns."
        )


def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel int8: w ~= values * scales."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / 127.0)
    values = jnp.clip(jnp.round(w32 / scales), -127, 127).astype(jnp.int8)
    return QuantizedTensor(values, scales, 8, w.shape[-1])


def quantize_int4(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel int4, two values per int8 byte.

    SPLIT-HALVES packing along the OUT dim: byte j holds column j in its
    low nibble and column j + out/2 in its high nibble (offset-binary
    [-8, 7]).  Unlike adjacent-column packing, unpacking never interleaves
    lanes — each nibble extraction is a pure elementwise chain on the
    packed buffer, so XLA fuses it straight into the matmul operand feed
    (measured on v5e: adjacent packing's stack/reshape interleave
    materialized the full bf16 weights per decode step, 10x slower).
    """
    w32 = w.astype(jnp.float32)
    out = w.shape[-1]
    if out % 2:
        raise ValueError("int4 packing requires an even out dim")
    amax = jnp.max(jnp.abs(w32), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(w32 / scales), -8, 7).astype(jnp.int8)
    half = out // 2
    lo = q[:, :half] & 0x0F
    hi = (q[:, half:] & 0x0F) << 4
    return QuantizedTensor((lo | hi).astype(jnp.int8), scales, 4, out)


def _unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(cols [0, out/2), cols [out/2, out)) as int8 from split-halves bytes."""
    lo = ((packed & 0x0F) ^ 0x08).astype(jnp.int8) - 8
    hi = (((packed >> 4) & 0x0F) ^ 0x08).astype(jnp.int8) - 8
    return lo, hi


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    if qt.bits == 8:
        w = qt.values.astype(jnp.float32)
    elif qt.bits == 4:
        _check_int4_layout(qt)
        lo, hi = _unpack_int4(qt.values)
        w = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    else:
        raise ValueError(f"unsupported bits {qt.bits}")
    return (w * qt.scales).astype(dtype)


def quantized_matmul(
    x: jax.Array, qt: QuantizedTensor, *, bias: jax.Array | None = None
) -> jax.Array:
    """x @ dequant(w) (+ bias).  XLA fuses the dequant into the matmul feed.

    int4 runs as two half-width matmuls (one per nibble half) so each
    operand is an elementwise chain on the packed bytes — no interleave op
    between the HBM read and the MXU.
    """
    if qt.bits == 4:
        _check_int4_layout(qt)
        half = qt.out_features // 2
        lo, hi = _unpack_int4(qt.values)
        sc = qt.scales.astype(x.dtype)
        y = jnp.concatenate(
            [
                (x @ lo.astype(x.dtype)) * sc[:half],
                (x @ hi.astype(x.dtype)) * sc[half:],
            ],
            axis=-1,
        )
    else:
        y = x @ dequantize(qt, dtype=x.dtype)
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
