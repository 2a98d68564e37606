"""Sharding/communication layer: meshes, TP rules, ring attention.

Explicit, named, testable collectives (SURVEY.md §5 "Distributed
communication backend") replacing the reference's implicit PopTorch/GCL
replication.
"""

from .inference_tp import (
    cache_specs,
    llama_param_specs,
    shard_llama_for_inference,
    tp_decode_loop,
    tp_prefill,
)
from .mesh import (
    DATA_AXIS, MODEL_AXIS, SEQ_AXIS, batch_sharding, make_mesh, replicated,
    seq_batch_sharding,
)
from .multihost import assert_same_across_hosts, initialize_multihost, topology
from .ring_attention import head_parallel_attention, ring_attention
from .sharding import gpt_param_sharding, gpt_param_specs, shard_params

__all__ = [
    "cache_specs",
    "llama_param_specs",
    "shard_llama_for_inference",
    "tp_decode_loop",
    "tp_prefill",
    "DATA_AXIS",
    "MODEL_AXIS",
    "SEQ_AXIS",
    "assert_same_across_hosts",
    "batch_sharding",
    "seq_batch_sharding",
    "gpt_param_sharding",
    "gpt_param_specs",
    "head_parallel_attention",
    "initialize_multihost",
    "make_mesh",
    "replicated",
    "ring_attention",
    "shard_params",
    "topology",
]
