"""Tensor-parallel inference: one model replica served across the `model`
mesh axis.

The reference has no inference engine at all (SURVEY.md §5); its only
scaling mechanism is training-time graph replication.  This module extends
the serving stack (flash_attention_tpu.inference / models.llama) across
chips the TPU way: Megatron-style column/row parameter sharding, the KV
cache sharded over kv heads, and the existing prefill/decode functions run
unchanged under jit — XLA/GSPMD inserts the per-layer psum after the
row-parallel projections, and attention itself is communication-free
(heads are independent, the sharding the reference's notebook cell 36
speculated about: "splitting heads across multiple chips … require no
communication").

Works for fp32/bf16 and weight-only-quantized (QuantizedTensor) params:
quantized leaves inherit the orientation of the weight they belong to.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey

from .mesh import MODEL_AXIS

# Megatron-style rules over models.llama.init_params leaf names:
# column-parallel (output dim sharded): wq/wk/wv over heads, w_gate/w_up
# over the MLP hidden, lm_head over vocab.  Row-parallel (input dim
# sharded, psum after): wo, w_down.  Everything else replicated (wte kept
# replicated so the token gather stays local).
_COL = {"wq", "wk", "wv", "w_gate", "w_up", "lm_head"}
_ROW = {"wo", "w_down"}


def _weight_name(path) -> str:
    """Nearest enclosing weight name (handles QuantizedTensor sub-leaves)."""
    for entry in reversed(path):
        if isinstance(entry, DictKey) and (
            str(entry.key) in _COL or str(entry.key) in _ROW
        ):
            return str(entry.key)
    return ""


def _leaf_spec(path, leaf) -> P:
    name = _weight_name(path)
    if not name:
        return P()
    ndim = getattr(leaf, "ndim", None)
    if ndim == 2:
        # weight (or int4/int8 payload): [in, out]
        return P(None, MODEL_AXIS) if name in _COL else P(MODEL_AXIS, None)
    if ndim == 1:
        # per-output-channel scale/bias: follows the output dim
        return P(MODEL_AXIS) if name in _COL else P()
    return P()


def llama_param_specs(params) -> object:
    """PartitionSpec pytree for a models.llama params pytree."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def _cache_specs(quantized: bool) -> object:
    from ..inference.kv_cache import KVCache

    payload = P(None, MODEL_AXIS)
    scale = payload if quantized else None
    return KVCache(k=payload, v=payload, k_scale=scale, v_scale=scale, lengths=P())


def cache_specs(cache) -> object:
    """PartitionSpec pytree for a KVCache: payloads and scales shard over
    the kv-heads dim (dim 1 of [n_layer, kv_heads, slots, max_len, ...]);
    lengths replicate."""
    from ..inference.kv_cache import KVCache

    assert isinstance(cache, KVCache)
    return _cache_specs(cache.quantized)


def _named(mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_llama_for_inference(params, cache, mesh: Mesh):
    """Place params + cache onto the mesh with TP shardings.

    Requires kv_heads % mesh.shape[model] == 0 (GQA groups stay whole per
    shard so grouped attention remains communication-free).
    """
    tp = mesh.shape[MODEL_AXIS]
    if cache.kv_heads % tp:
        raise ValueError(
            f"kv_heads {cache.kv_heads} not divisible by model axis {tp}"
        )
    params = jax.tree.map(
        jax.device_put, params, _named(mesh, llama_param_specs(params))
    )
    cache = jax.tree.map(
        jax.device_put, cache, _named(mesh, cache_specs(cache))
    )
    return params, cache


# The jitted fns are built once per (cfg, mesh, ...) key — cfg is a frozen
# dataclass and Mesh is hashable — so repeated serving calls hit jit's
# compile cache instead of retracing a fresh lambda every call.
@functools.lru_cache(maxsize=32)
def _prefill_fn(cfg, mesh: Mesh, quantized: bool):
    from ..models import llama

    return jax.jit(
        lambda p, t, c, s, n: llama.prefill(p, t, cfg, c, s, n),
        out_shardings=(_named(mesh, _cache_specs(quantized)), None),
    )


@functools.lru_cache(maxsize=32)
def _decode_loop_fn(cfg, mesh: Mesh, quantized: bool, n_steps: int):
    from ..models import llama

    return jax.jit(
        lambda p, c, t: llama.decode_loop(p, cfg, c, t, n_steps),
        out_shardings=(_named(mesh, _cache_specs(quantized)), None),
    )


def tp_prefill(params, tokens, cfg, cache, slot, mesh: Mesh, length=None):
    """jit-compiled llama.prefill with TP-sharded params/cache.

    The cache out-sharding is pinned so the updated cache STAYS sharded
    across calls instead of being gathered to host layout.
    """
    fn = _prefill_fn(cfg, mesh, cache.quantized)
    return fn(params, tokens, cache, slot, length)


def tp_decode_loop(params, cfg, cache, first_tokens, n_steps, mesh: Mesh):
    """jit-compiled llama.decode_loop with TP-sharded params/cache: per
    decode step each shard computes its heads' attention + column slices
    locally; the only collectives are the row-parallel psums (wo, w_down)
    and the vocab-sharded argmax reduction."""
    fn = _decode_loop_fn(cfg, mesh, cache.quantized, n_steps)
    return fn(params, cache, first_tokens)
