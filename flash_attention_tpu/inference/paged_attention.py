"""Paged attention: decode against a non-contiguous paged KV cache.

North-star serving kernel (no reference analog; the reference's long-context
mechanism is intra-chip chunk serialization, SURVEY.md §5).  The KV cache
lives in HBM as pages `[kv_heads, total_pages, page_size, head_dim]`; each
sequence owns a `page_indices` row mapping logical blocks to physical pages.
The kernel gathers the pages it needs with per-page async DMA (pages are
non-contiguous, so BlockSpec pipelining cannot fetch them) and runs online
softmax over one compute block per grid step, skipping blocks past the
sequence length — so decode cost tracks the *actual* length, not max_len.

Double-buffered: while a block computes, the next computing cell's pages
stream into the other half of the VMEM buffers (the walk order skips
past-length blocks, so prefetch always targets real work).  INT8/FP8 pages
are supported with per-token scales: scale pages DMA alongside payloads and
fold into the score/weight tensors, keeping the HBM stream at 1 byte/element.

A pure-jnp reference implementation backs the parity tests.
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
    k_hbm,  # [hkv, n_pages, page_size, d] HBM
    v_hbm,
    ks_hbm,  # [hkv, n_pages, page_size] HBM (quant only; else placeholder)
    vs_hbm,
    # outputs
    o_ref,  # [1, 1, group, d] VMEM
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    k_buf,  # [2, ppcb, page_size, d] VMEM (double-buffered)
    v_buf,
    ks_buf,  # [2, ppcb, page_size] VMEM f32
    vs_buf,
    buf_idx,  # SMEM [1] int32: which buffer half the CURRENT cell uses
    k_sems,  # DMA sems [2, ppcb]
    v_sems,
    ks_sems,
    vs_sems,
    *,
    sm_scale: float,
    batch: int,
    hkv: int,
    pages_per_seq: int,
    ppcb: int,
    page_size: int,
    nblocks: int,
    quantized: bool,
    pack: int = 1,
):
    """pack > 1: head_dim < 128 lane-packing.  K/V pages arrive reshaped
    (free, row-major) to [.., page_size/pack, d*pack] so the per-page DMA
    trailing extent is 128; packed row r of a page holds tokens
    pack*r .. pack*r+pack-1 side by side in lanes.  The kernel computes
    scores per lane-group g (a static lane slice of the packed buffer), so
    score column c corresponds to token (c%bkp)//rows_pp*page_size +
    pack*((c%bkp)%rows_pp) + c//bkp; masks use that mapping directly and
    quantization scales are permuted into it with a one-hot matmul."""
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    group, d = q_ref.shape[2], q_ref.shape[3]
    bk = ppcb * page_size
    bkp = bk // pack  # score columns per lane-group
    rows_pp = page_size // pack  # packed rows per page
    length = lengths_ref[b]

    def copies(bb, hh, ii, slot):
        """Per-page DMA descriptors for cell (bb, hh, ii) into buffer half
        `slot`.  Recreated identically at start and wait time."""
        out = []
        for p in range(ppcb):
            idx = pages_ref[bb * pages_per_seq + ii * ppcb + p]
            out.append(
                pltpu.make_async_copy(
                    k_hbm.at[hh, idx], k_buf.at[slot, p], k_sems.at[slot, p]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    v_hbm.at[hh, idx], v_buf.at[slot, p], v_sems.at[slot, p]
                )
            )
            if quantized:
                out.append(
                    pltpu.make_async_copy(
                        ks_hbm.at[hh, idx], ks_buf.at[slot, p], ks_sems.at[slot, p]
                    )
                )
                out.append(
                    pltpu.make_async_copy(
                        vs_hbm.at[hh, idx], vs_buf.at[slot, p], vs_sems.at[slot, p]
                    )
                )
        return out

    def start(bb, hh, ii, slot):
        for c in copies(bb, hh, ii, slot):
            c.start()

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # Very first cell: fetch its own pages into half 0 (lengths >= 1 is a
    # kernel precondition, so cell (0,0,0) always computes).
    is_first = jnp.logical_and(b == 0, jnp.logical_and(h == 0, i == 0))

    @pl.when(is_first)
    def _seed():
        buf_idx[0] = 0
        start(b, h, i, 0)

    @pl.when(i * bk < length)
    def _compute():
        slot = buf_idx[0]

        # Next computing cell (skip past-length blocks): same sequence if its
        # next block is in range, else first block of the next (h, b).
        more_here = (i + 1) * bk < length
        nb = jnp.where(more_here, b, jnp.where(h + 1 < hkv, b, b + 1))
        nh = jnp.where(more_here, h, jnp.where(h + 1 < hkv, h + 1, 0))
        ni_ = jnp.where(more_here, i + 1, 0)

        @pl.when(nb < batch)
        def _prefetch():
            start(nb, nh, ni_, 1 - slot)

        # Wait for this cell's pages (started by the previous computing cell
        # or by the seed above).
        cps = copies(b, h, i, slot)
        per = 4 if quantized else 2
        for c in range(ppcb):
            cps[c * per].wait()  # K payload
            if quantized:
                cps[c * per + 2].wait()  # K scales

        q = q_ref[0, 0]  # [group, d]

        def col_token(c):
            """Token index of score column c (identity when pack == 1)."""
            if pack == 1:
                return c
            r = c % bkp
            g = c // bkp
            return (r // rows_pp) * page_size + pack * (r % rows_pp) + g

        if pack == 1:
            k = k_buf[slot].reshape(bk, d)
            s = jax.lax.dot_general(
                q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            kb = k_buf[slot].reshape(bkp, d * pack)
            s = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        q,
                        kb[:, g * d : (g + 1) * d].astype(q.dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for g in range(pack)
                ],
                axis=1,
            )
        s = s * sm_scale
        if quantized:
            ks = ks_buf[slot].reshape(1, bk)
            if pack > 1:
                # permute token-order scales into score-column order with a
                # one-hot matmul (tiny: (1,bk)@(bk,bk))
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 0)
                cols_i = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
                perm = (rows_i == col_token(cols_i)).astype(jnp.float32)
                ks = jax.lax.dot(ks, perm, preferred_element_type=jnp.float32)
            s = s * ks
        col = i * bk + col_token(
            jax.lax.broadcasted_iota(jnp.int32, (group, bk), 1)
        )
        s = s + jnp.where(col < length, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p_w = jnp.exp(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p_w, axis=-1, keepdims=True)
        m_scr[...] = m_next

        for c in range(ppcb):
            cps[c * per + 1].wait()  # V payload
            if quantized:
                cps[c * per + 3].wait()  # V scales
        if quantized:
            vs = vs_buf[slot].reshape(1, bk)
            if pack > 1:
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 0)
                cols_i = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
                perm = (rows_i == col_token(cols_i)).astype(jnp.float32)
                vs = jax.lax.dot(vs, perm, preferred_element_type=jnp.float32)
            p_w = p_w * vs
        if pack == 1:
            v = v_buf[slot].reshape(bk, d)
            acc = jax.lax.dot(
                p_w.astype(q.dtype), v.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            vb = v_buf[slot].reshape(bkp, d * pack)
            acc = sum(
                jax.lax.dot(
                    p_w[:, g * bkp : (g + 1) * bkp].astype(q.dtype),
                    vb[:, g * d : (g + 1) * d].astype(q.dtype),
                    preferred_element_type=jnp.float32,
                )
                for g in range(pack)
            )
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + acc
        buf_idx[0] = 1 - slot

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
      lengths: [batch] int32 — valid tokens per sequence INCLUDING the
        current token already written to its page.  Must be >= 1 (the
        double-buffered prefetch walk assumes block 0 always computes).
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
    pack = 1
    if d % 128:
        # Mosaic requires 128-aligned trailing extents for per-page DMA
        # slices (measured: d=64 fails, d=128 works, any array size).
        # Lane-pack small head dims: view pages as (page_size/pack, d*pack)
        # — a free row-major reshape — and unpack inside the kernel.
        if 128 % d or page_size % (128 // d):
            raise ValueError(
                f"paged_attention needs head_dim dividing 128 with "
                f"page_size % (128/head_dim) == 0 (got d={d}, "
                f"page_size={page_size}); use decode_attention instead"
            )
        pack = 128 // d
        n_pages = k_pages.shape[1]
        k_pages = k_pages.reshape(
            hkv, n_pages, page_size // pack, d * pack
        )
        v_pages = v_pages.reshape(
            hkv, n_pages, page_size // pack, d * pack
        )
    ppcb = min(pages_per_compute_block, pages_per_seq)
    while pages_per_seq % ppcb:
        ppcb -= 1
    nblocks = pages_per_seq // ppcb

    q4 = q.reshape(batch, hkv, group, d)
    kernel = functools.partial(
        _paged_kernel,
        sm_scale=float(sm_scale),
        batch=batch,
        hkv=hkv,
        pages_per_seq=pages_per_seq,
        ppcb=ppcb,
        page_size=page_size,
        nblocks=nblocks,
        quantized=quantized,
        pack=pack,
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
            # alignment limits.
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
            pltpu.VMEM((2, ppcb, page_size // pack, d * pack), k_pages.dtype),
            pltpu.VMEM((2, ppcb, page_size // pack, d * pack), v_pages.dtype),
            pltpu.VMEM((2, ppcb, page_size), jnp.float32),
            pltpu.VMEM((2, ppcb, page_size), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, ppcb)),
            pltpu.SemaphoreType.DMA((2, ppcb)),
            pltpu.SemaphoreType.DMA((2, ppcb)),
            pltpu.SemaphoreType.DMA((2, ppcb)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(
        jnp.maximum(lengths.astype(jnp.int32), 1),
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
    valid = jnp.arange(l_max)[None, :] < jnp.maximum(lengths, 1)[:, None]
    s = jnp.where(valid[:, None, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p, v)
    return o.reshape(batch, hq, d).astype(q.dtype)
