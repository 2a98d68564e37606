"""Sequence-parallel attention: ring attention over a mesh axis.

The reference's entire long-context story is *temporal serialization on one
chip*: the inner Repeat loop over kv chunks
(/root/reference/flash_attention_ipu/cpp/flash_attention_qkv_packed.cpp:311).
Ring attention is the direct TPU analog with the kv loop axis mapped onto
devices: KV is sequence-sharded, each step computes flash attention against
the resident KV shard while `jax.lax.ppermute` rotates shards around the ICI
ring, and partial results merge with the same online-softmax correction the
kernel uses per tile (lse-weighted combine).

Per-shard compute uses the Pallas kernel via `flash_attention_with_lse`
(differentiable in both outputs, so the whole ring trains under jax.grad);
the causal structure across shards is static per step:

  source == self  -> diagonal shard: causal kernel
  source <  self  -> fully visible:  non-causal kernel
  source >  self  -> fully masked:   skipped (zero weight)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kernels.block_sizes import BlockSizes
from ..kernels.flash_attention import flash_attention_with_lse

_NEG_BIG = -1e30


def _merge(o1, lse1, o2, lse2):
    """Combine two normalized partials (o, lse) -> (o, lse).

    Cross-shard version of the kernel's online softmax correction
    (cpp/flash_attention_qkv_packed.cpp:281-296).
    """
    m = jnp.maximum(lse1, lse2)
    a = jnp.exp(lse1 - m)[..., None]
    b = jnp.exp(lse2 - m)[..., None]
    denom = a + b
    o = (a * o1.astype(jnp.float32) + b * o2.astype(jnp.float32)) / denom
    lse = m + jnp.log(denom[..., 0])
    return o, lse


def _ring_body(
    q, k, v, *, axis_name: str, causal: bool, sm_scale: float | None,
    block_sizes: BlockSizes | None,
):
    """Per-device body under shard_map: q,k,v are the local shards
    [B, H, L/N, D] (kv sharded; q sharded identically)."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    attend = functools.partial(
        flash_attention_with_lse, sm_scale=sm_scale, block_sizes=block_sizes
    )

    o = jnp.zeros(q.shape, jnp.float32)
    lse = jnp.full(q.shape[:-1], _NEG_BIG, jnp.float32)
    k_blk, v_blk = k, v

    for step in range(n):  # static loop: n is a python int at trace time
        src = (my - step) % n

        if causal:
            partial_o, partial_lse = jax.lax.cond(
                src == my,
                lambda q, kb, vb: attend(q, kb, vb, causal=True),
                lambda q, kb, vb: jax.lax.cond(
                    src < my,
                    lambda q, kb, vb: attend(q, kb, vb, causal=False),
                    # future shard: fully masked -> zero weight
                    lambda q, kb, vb: (
                        jnp.zeros(q.shape, q.dtype),
                        jnp.full(q.shape[:-1], _NEG_BIG, jnp.float32),
                    ),
                    q, kb, vb,
                ),
                q, k_blk, v_blk,
            )
        else:
            partial_o, partial_lse = attend(q, k_blk, v_blk, causal=False)

        o, lse = _merge(o, lse, partial_o, partial_lse)

        if step < n - 1:
            # rotate KV shards around the ring (ICI point-to-point)
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return o.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "seq",
    causal: bool = True,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
) -> jax.Array:
    """Sequence-sharded attention over `mesh[axis_name]`.

    q, k, v: [B, H, L, D] global arrays with L divisible by the axis size;
    they are sharded on L over `axis_name`.  Output is sharded like q.
    DIFFERENTIABLE: the per-shard kernel exposes an lse cotangent (see
    kernels/flash_attention.py::_flash_lse_bwd_rule) and ppermute/cond
    transpose cleanly, so jax.grad derives the reverse ring — KV-shard
    gradients rotate back around the ring automatically.
    """
    if sm_scale is None:
        sm_scale = float(q.shape[-1]) ** -0.5
    body = functools.partial(
        _ring_body,
        axis_name=axis_name,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
    spec = P(None, None, axis_name, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )(q, k, v)


def head_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """Explicit head-sharded attention: zero communication during attention.

    The reference's intended-but-unimplemented scaling story (notebook cell
    36).  KV heads shard with their GQA q-head groups co-located.
    Differentiable (shard_map of the custom_vjp kernel).
    """
    from ..kernels.flash_attention import flash_attention

    def body(q, k, v):
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)

    spec = P(None, axis_name, None, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )(q, k, v)
