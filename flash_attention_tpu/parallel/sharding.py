"""Parameter sharding rules: tensor parallelism for the GPT model.

The reference *discusses* head-split tensor parallelism as its intended
scaling story ("splitting heads across multiple chips … require no
communication", demo notebook cell 36) but never implements it.  Here it is:
attention QKV/output projections shard over heads, MLP shards over the hidden
dim (Megatron-style column/row split), embeddings shard over vocab.  XLA
inserts the psum after row-parallel matmuls when jit partitions the step.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, SequenceKey

from .mesh import MODEL_AXIS

# Name -> spec rules over the gpt.init_params pytree:
#   wqkv [E, (Hq+2Hkv)D] column-parallel; wo [E, E] row-parallel;
#   wfc [E, 4E] column-parallel; wproj [4E, E] row-parallel;
#   wte [V, E] vocab-sharded; biases of column-parallel layers follow their
#   outputs; everything small (layernorm, wpe) replicated.
_RULES: dict[str, P] = {
    "wqkv": P(None, MODEL_AXIS),
    "bqkv": P(MODEL_AXIS),
    "wo": P(MODEL_AXIS, None),
    "wfc": P(None, MODEL_AXIS),
    "bfc": P(MODEL_AXIS),
    "wproj": P(MODEL_AXIS, None),
    "wte": P(MODEL_AXIS, None),
}


def _leaf_name(path) -> str:
    for entry in reversed(path):
        if isinstance(entry, DictKey):
            return str(entry.key)
        if isinstance(entry, SequenceKey):
            continue
    return ""


def gpt_param_specs(params) -> object:
    """PartitionSpec pytree matching an actual params pytree structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _RULES.get(_leaf_name(path), P()), params
    )


def gpt_param_sharding(mesh: Mesh, params) -> object:
    """NamedSharding pytree for jit in_shardings / device_put."""
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        gpt_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh) -> object:
    """Place an existing params pytree onto the mesh."""
    return jax.tree.map(
        jax.device_put, params, gpt_param_sharding(mesh, params)
    )
