"""Paged attention: decode against a non-contiguous paged KV cache.

North-star serving kernel (no reference analog; the reference's long-context
mechanism is intra-chip chunk serialization, SURVEY.md §5).  The KV cache
lives in HBM as pages `[kv_heads, total_pages, page_size, head_dim]`; each
sequence owns a `page_indices` row mapping logical blocks to physical pages.
The kernel gathers the pages it needs with per-page async DMA (pages are
non-contiguous, so BlockSpec pipelining cannot fetch them) and runs online
softmax over one compute block per grid step, skipping blocks past the
sequence length — so decode cost tracks the *actual* length, not max_len.

INT8/FP8 pages are supported with per-token scales: scale pages DMA alongside
payload pages and fold into the score/weight tensors (two (group, bk) VPU
multiplies), keeping the HBM stream at 1 byte/element — the bandwidth win
that makes quantized KV worth it at decode time.

v0 is single-buffered (DMA -> wait -> compute per block); double-buffered
prefetch is the known next step.  A pure-jnp reference implementation backs
the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import use_interpret
from ..kernels.vanilla import DEFAULT_MASK_VALUE


def _paged_kernel(
    # scalar prefetch
    lengths_ref,  # [batch]
    pages_ref,  # [batch * pages_per_seq]
    # inputs
    q_ref,  # [1, 1, group, d] VMEM
    k_hbm,  # [hkv, n_pages, page_size, d] ANY
    v_hbm,
    ks_hbm,  # [hkv, n_pages, page_size] ANY or None-placeholder
    vs_hbm,
    # outputs
    o_ref,  # [1, 1, group, d] VMEM
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    k_buf,  # [ppcb, page_size, d] VMEM
    v_buf,
    ks_buf,  # [ppcb, page_size] VMEM f32 (quant only)
    vs_buf,
    k_sems,
    v_sems,
    ks_sems,
    vs_sems,
    *,
    sm_scale: float,
    pages_per_seq: int,
    ppcb: int,
    page_size: int,
    nblocks: int,
    quantized: bool,
):
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    group, d = q_ref.shape[2], q_ref.shape[3]
    bk = ppcb * page_size
    length = lengths_ref[b]

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    @pl.when(i * bk < length)
    def _compute():
        # gather this block's pages: one DMA per page, all in flight at once
        copies = []
        for p in range(ppcb):
            idx = pages_ref[b * pages_per_seq + i * ppcb + p]
            cp = [
                pltpu.make_async_copy(k_hbm.at[h, idx], k_buf.at[p], k_sems.at[p]),
                pltpu.make_async_copy(v_hbm.at[h, idx], v_buf.at[p], v_sems.at[p]),
            ]
            if quantized:
                cp.append(
                    pltpu.make_async_copy(
                        ks_hbm.at[h, idx], ks_buf.at[p], ks_sems.at[p]
                    )
                )
                cp.append(
                    pltpu.make_async_copy(
                        vs_hbm.at[h, idx], vs_buf.at[p], vs_sems.at[p]
                    )
                )
            for c in cp:
                c.start()
            copies.append(cp)
        for cp in copies:
            cp[0].wait()  # K payload
            if quantized:
                cp[2].wait()  # K scales

        q = q_ref[0, 0]  # [group, d]
        k = k_buf[...].reshape(bk, d)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale
        if quantized:
            s = s * ks_buf[...].reshape(1, bk)
        col = i * bk + jax.lax.broadcasted_iota(jnp.int32, (group, bk), 1)
        s = s + jnp.where(col < length, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p_w = jnp.exp(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p_w, axis=-1, keepdims=True)
        m_scr[...] = m_next

        for cp in copies:
            cp[1].wait()  # V payload
            if quantized:
                cp[3].wait()  # V scales
        if quantized:
            p_w = p_w * vs_buf[...].reshape(1, bk)
        v = v_buf[...].reshape(bk, d)
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p_w.astype(q.dtype), v.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nblocks - 1)
    def _store():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (
            (acc_scr[...] / l_safe).reshape(1, 1, group, d).astype(o_ref.dtype)
        )


def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    sm_scale: float | None = None,
    pages_per_compute_block: int = 8,
) -> jax.Array:
    """Decode-step attention over a paged KV cache.

    Args:
      q: [batch, q_heads, head_dim] — one new token per sequence.
      k_pages, v_pages: [kv_heads, total_pages, page_size, head_dim]
        (bf16/f32, or int8/fp8 with k_scales/v_scales given).
      lengths: [batch] int32 — valid tokens per sequence (INCLUDING the
        current token, already written to its page).
      page_indices: [batch, pages_per_seq] int32 — physical page ids.
      k_scales, v_scales: [kv_heads, total_pages, page_size] per-token
        dequant scales for quantized pages.
      pages_per_compute_block: pages gathered per kernel step.

    Returns: [batch, q_heads, head_dim].
    """
    batch, hq, d = q.shape
    hkv, _, page_size, _ = k_pages.shape
    group = hq // hkv
    pages_per_seq = page_indices.shape[1]
    quantized = k_scales is not None
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    if d % 128 and not use_interpret():
        # Mosaic requires 128-aligned trailing extents for per-page DMA
        # slices (measured: d=64 fails, d=128 works, any array size).
        raise ValueError(
            f"paged_attention requires head_dim % 128 == 0 on TPU (got {d}); "
            "pad the KV pages to 128 lanes or use decode_attention"
        )
    ppcb = min(pages_per_compute_block, pages_per_seq)
    while pages_per_seq % ppcb:
        ppcb -= 1
    nblocks = pages_per_seq // ppcb

    q4 = q.reshape(batch, hkv, group, d)
    kernel = functools.partial(
        _paged_kernel,
        sm_scale=float(sm_scale),
        pages_per_seq=pages_per_seq,
        ppcb=ppcb,
        page_size=page_size,
        nblocks=nblocks,
        quantized=quantized,
    )
    if not quantized:
        # zero-size placeholders so the kernel arity is static
        k_scales = jnp.zeros((1, 1, 8), jnp.float32)
        v_scales = jnp.zeros((1, 1, 8), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, hkv, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, d), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            # Pages MUST stay in HBM: with ANY, Mosaic may place small page
            # arrays in VMEM, where per-page DMA slices hit (8,128) tiling
            # alignment limits at head_dim 64.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, d), lambda b, h, i, *_: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
            pltpu.VMEM((ppcb, page_size, d), k_pages.dtype),
            pltpu.VMEM((ppcb, page_size, d), v_pages.dtype),
            pltpu.VMEM((ppcb, page_size), jnp.float32),
            pltpu.VMEM((ppcb, page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((ppcb,)),
            pltpu.SemaphoreType.DMA((ppcb,)),
            pltpu.SemaphoreType.DMA((ppcb,)),
            pltpu.SemaphoreType.DMA((ppcb,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(
        lengths.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        q4,
        k_pages,
        v_pages,
        k_scales.astype(jnp.float32),
        v_scales.astype(jnp.float32),
    )
    return out.reshape(batch, hq, d)


def paged_attention_ref(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    sm_scale: float | None = None,
) -> jax.Array:
    """Pure-jnp reference: gather + dequantize pages, dense masked attention."""
    batch, hq, d = q.shape
    hkv, _, page_size, _ = k_pages.shape
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    k = jnp.moveaxis(k_pages[:, page_indices], 1, 0).astype(jnp.float32)
    v = jnp.moveaxis(v_pages[:, page_indices], 1, 0).astype(jnp.float32)
    if k_scales is not None:
        k = k * jnp.moveaxis(k_scales[:, page_indices], 1, 0)[..., None]
        v = v * jnp.moveaxis(v_scales[:, page_indices], 1, 0)[..., None]
    l_max = k.shape[2] * page_size
    k = k.reshape(batch, hkv, l_max, d)
    v = v.reshape(batch, hkv, l_max, d)
    q4 = q.reshape(batch, hkv, group, d).astype(jnp.float32)
    s = jnp.einsum(
        "bhgd,bhld->bhgl", q4, k, preferred_element_type=jnp.float32
    ) * sm_scale
    valid = jnp.arange(l_max)[None, :] < lengths[:, None]
    s = jnp.where(valid[:, None, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p, v)
    return o.reshape(batch, hq, d).astype(q.dtype)
