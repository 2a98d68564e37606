"""Quantization layer: weight-only INT8/INT4 + INT8/FP8 KV cache.

North-star extension with no reference analog (SURVEY.md §7 stage 4).
"""

from .kv import (
    QuantizedKV,
    dequantize_kv,
    flash_attention_kv_quant,
    quantize_kv,
)
from .weights import (
    QuantizedTensor,
    dequantize,
    gpt_forward_quantized,
    quantize_gpt_params,
    quantize_int4,
    quantize_int8,
    quantize_llama_params,
    quantize_params,
    quantized_matmul,
)

__all__ = [
    "QuantizedKV",
    "QuantizedTensor",
    "dequantize",
    "dequantize_kv",
    "flash_attention_kv_quant",
    "gpt_forward_quantized",
    "quantize_gpt_params",
    "quantize_int4",
    "quantize_int8",
    "quantize_kv",
    "quantize_llama_params",
    "quantize_params",
    "quantized_matmul",
]
