"""Device mesh construction.

The reference's only multi-chip mechanism is PopTorch graph replication
(demo/train.py:214) plus a `gc-monitor` device count probe
(.gradient/available_ipus.py:6-12).  The TPU-native generalization: an
explicit `jax.sharding.Mesh` with named axes

  data  — data parallelism (PopTorch replicationFactor analog)
  model — tensor parallelism over attention heads / MLP hidden
  seq   — sequence (context) parallelism for ring attention

Collectives then ride ICI via pjit/shard_map rather than hidden GCL calls.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, model, seq) mesh from the available devices.

    Any axis set to -1 absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dims = [data, model, seq]
    if dims.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in dims:
        known = int(np.prod([d for d in dims if d != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        dims[dims.index(-1)] = n // known
    total = int(np.prod(dims))
    if total > n:
        raise ValueError(f"mesh {dims} needs {total} devices, have {n}")
    arr = np.asarray(devices[:total]).reshape(dims)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def seq_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Context-parallel training batches [B, T]: batch over data, tokens
    over seq — pairs with GPTConfig/LlamaConfig(seq_mesh=mesh,
    seq_batch_axis=DATA_AXIS) so activations stay sequence-sharded end to
    end and ring attention's shard_map keeps both axes distributed."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
