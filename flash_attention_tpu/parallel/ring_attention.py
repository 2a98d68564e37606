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
    [B, H, L/N, D] (kv sharded; q sharded identically).

    Communication/compute overlap: the ppermute moving the KV shard for
    step s+1 is issued BEFORE step s's attention kernel, and its result is
    only consumed after — a double-buffered carry with no data dependence
    between the in-flight transfer and the running kernel, which lets XLA's
    latency-hiding scheduler run the collective under the compute
    (BASELINE.json: "ring-attention collectives overlapped with compute").
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    attend = functools.partial(
        flash_attention_with_lse, sm_scale=sm_scale, block_sizes=block_sizes
    )
    perm = [(i, (i + 1) % n) for i in range(n)]

    o = jnp.zeros(q.shape, jnp.float32)
    lse = jnp.full(q.shape[:-1], _NEG_BIG, jnp.float32)
    k_blk, v_blk = k, v

    for step in range(n):  # static loop: n is a python int at trace time
        if step < n - 1:
            # Pre-issue the rotation for the NEXT step (ICI point-to-point);
            # independent of this step's kernel, so they overlap.
            k_next = jax.lax.ppermute(k_blk, axis_name, perm)
            v_next = jax.lax.ppermute(v_blk, axis_name, perm)

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
            k_blk, v_blk = k_next, v_next

    return o.astype(q.dtype)


def _skip_partial(q):
    """(o, lse) of a fully-masked block: zero weight in the merge."""
    return (
        jnp.zeros(q.shape, jnp.float32),
        jnp.full(q.shape[:-1], _NEG_BIG, jnp.float32),
    )


def _zigzag_body(
    q, k, v, *, axis_name: str, sm_scale: float | None,
    block_sizes: BlockSizes | None,
):
    """Causal ring body for zig-zag (striped) sharded sequences.

    With contiguous sharding, causal masking makes device 0 do useful work
    on only 1 of n ring steps while device n-1 works on all n — the ring's
    wall-clock is set by the worst device.  Zig-zag sharding fixes the
    imbalance: split the sequence into 2n chunks and give device d chunks
    (d, 2n-1-d) — one early, one late.  Per ring step, against the KV shard
    originating at device `src` (chunks (src, 2n-1-src)), exactly two
    chunk-pairs are ever visible for EVERY (d, src) combination:

      src <  d: q_lo sees kv_lo (full)  + q_hi sees kv_lo (full)
      src >  d: q_hi sees kv_lo (full)  + q_hi sees kv_hi (full)
      src == d: q_lo/kv_lo diagonal + q_hi sees kv_lo full, kv_hi diagonal

    so every device does the same work every step (the standard zig-zag /
    striped schedule).  The q_len != kv_len causal offset of the kernel
    (queries aligned to the end of kv) handles the src == d combined call.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    attend = functools.partial(
        flash_attention_with_lse, sm_scale=sm_scale, block_sizes=block_sizes
    )
    perm = [(i, (i + 1) % n) for i in range(n)]

    half = q.shape[2] // 2
    q_lo, q_hi = q[:, :, :half], q[:, :, half:]

    o_lo = jnp.zeros(q_lo.shape, jnp.float32)
    lse_lo = jnp.full(q_lo.shape[:-1], _NEG_BIG, jnp.float32)
    o_hi, lse_hi = o_lo, lse_lo
    k_blk, v_blk = k, v

    def step_past(q_lo, q_hi, kb, vb):
        # src < my: both q chunks fully see kv_lo; one non-causal kernel
        # over the concatenated q rows.
        kv_lo, v_lo = kb[:, :, :half], vb[:, :, :half]
        o, lse = attend(
            jnp.concatenate([q_lo, q_hi], axis=2), kv_lo, v_lo, causal=False
        )
        return (
            o[:, :, :half], lse[:, :, :half],
            o[:, :, half:], lse[:, :, half:],
        )

    def step_future(q_lo, q_hi, kb, vb):
        # src > my: only q_hi sees anything — the full kv shard.
        o, lse = attend(q_hi, kb, vb, causal=False)
        zo, zl = _skip_partial(q_lo)
        return zo, zl, o, lse

    def step_diag(q_lo, q_hi, kb, vb):
        # src == my: q_lo/kv_lo causal diagonal; q_hi sees kv_lo fully and
        # kv_hi on the diagonal — one causal call with the q-at-end offset.
        o1, l1 = attend(q_lo, kb[:, :, :half], vb[:, :, :half], causal=True)
        o2, l2 = attend(q_hi, kb, vb, causal=True)
        return o1, l1, o2, l2

    for step in range(n):
        if step < n - 1:
            k_next = jax.lax.ppermute(k_blk, axis_name, perm)
            v_next = jax.lax.ppermute(v_blk, axis_name, perm)

        src = (my - step) % n
        po_lo, pl_lo, po_hi, pl_hi = jax.lax.cond(
            src == my,
            step_diag,
            lambda ql, qh, kb, vb: jax.lax.cond(
                src < my, step_past, step_future, ql, qh, kb, vb
            ),
            q_lo, q_hi, k_blk, v_blk,
        )
        o_lo, lse_lo = _merge(o_lo, lse_lo, po_lo, pl_lo)
        o_hi, lse_hi = _merge(o_hi, lse_hi, po_hi, pl_hi)

        if step < n - 1:
            k_blk, v_blk = k_next, v_next

    return jnp.concatenate([o_lo, o_hi], axis=2).astype(q.dtype)


def zigzag_indices(l: int, n: int) -> "jnp.ndarray":
    """Global gather indices putting a length-l sequence into zig-zag
    order for n devices: device d's shard = chunks (d, 2n-1-d) of size
    l/(2n).  Apply before sharding; invert with `zigzag_inverse`."""
    chunk = l // (2 * n)
    order = []
    for d in range(n):
        order.extend(range(d * chunk, (d + 1) * chunk))
        j = 2 * n - 1 - d
        order.extend(range(j * chunk, (j + 1) * chunk))
    return jnp.asarray(order, jnp.int32)


def zigzag_inverse(l: int, n: int) -> "jnp.ndarray":
    idx = zigzag_indices(l, n)
    inv = jnp.zeros(l, jnp.int32).at[idx].set(jnp.arange(l, dtype=jnp.int32))
    return inv


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
    zigzag: bool = False,
    batch_axis: str | None = None,
    preordered: bool = False,
) -> jax.Array:
    """Sequence-sharded attention over `mesh[axis_name]`.

    q, k, v: [B, H, L, D] global arrays with L divisible by the axis size;
    they are sharded on L over `axis_name`.  Output is sharded like q.
    DIFFERENTIABLE: the per-shard kernel exposes an lse cotangent (see
    kernels/flash_attention.py::_flash_lse_bwd_rule) and ppermute/cond
    transpose cleanly, so jax.grad derives the reverse ring — KV-shard
    gradients rotate back around the ring automatically.

    The KV rotation for step s+1 is issued before step s's kernel
    (double-buffered carry), so the ICI transfer overlaps compute.

    zigzag=True (causal only) uses striped sharding for load balance:
    inputs are re-ordered into zig-zag chunk order (device d holds chunks
    (d, 2n-1-d) of 2n), every device then does identical causal work per
    ring step, and the output is restored to natural order.  Requires L
    divisible by 2n.

    batch_axis: mesh axis the BATCH dim is sharded over (dp x cp training:
    pass the "data" axis so the shard_map keeps the batch distributed
    instead of forcing an all-gather to replicate it).

    preordered=True (with zigzag): inputs are ALREADY in zig-zag chunk
    order and the output is returned in that order — no take/untake.  The
    model-integration path uses this so a whole transformer pays the two
    boundary permutes ONCE (tokens at embedding, logits at the head)
    instead of two gathers per layer.
    """
    if sm_scale is None:
        sm_scale = float(q.shape[-1]) ** -0.5
    spec = P(batch_axis, None, axis_name, None)
    if zigzag:
        if not causal:
            raise ValueError("zigzag sharding only applies to causal")
        n = mesh.shape[axis_name]
        l = q.shape[2]
        if l % (2 * n):
            raise ValueError(f"zigzag needs L % (2*n) == 0 (L={l}, n={n})")
        if preordered:
            qz, kz, vz = q, k, v
        else:
            idx = zigzag_indices(l, n)
            qz, kz, vz = (jnp.take(x, idx, axis=2) for x in (q, k, v))
        body = functools.partial(
            _zigzag_body,
            axis_name=axis_name,
            sm_scale=sm_scale,
            block_sizes=block_sizes,
        )
        out = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_rep=False,
        )(qz, kz, vz)
        if preordered:
            return out
        return jnp.take(out, zigzag_inverse(l, n), axis=2)
    body = functools.partial(
        _ring_body,
        axis_name=axis_name,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
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
