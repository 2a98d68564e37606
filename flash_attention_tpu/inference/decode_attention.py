"""Decode-step attention: one new token per slot against the KV cache.

Decode attention is HBM-bandwidth-bound (each step streams the cache once
for a rank-1 q), so three implementations trade generality for bandwidth:

* ``decode_attention`` — fused XLA einsum with length masking.  Simple and
  always correct, but it reads the FULL cache capacity regardless of the
  actual sequence lengths, and for quantized caches XLA materializes the
  dequantized payload to HBM before the dot (measured: int8 einsum decode
  is *slower* than bf16).
* ``decode_attention_fused`` — slot-major Pallas kernel over the slot cache:
  one grid cell per (slot, token-block) covering ALL kv heads, manual
  double-buffered DMA that stops at each slot's length (decode cost tracks
  the actual context, not capacity), per-token dequant fused in VMEM (the
  HBM stream stays 1 byte/elem), and lane-packing for head_dim < 128.
  Measured SLOWER than the einsum on v5e (see BASELINE.md) — an option for
  short-context/long-capacity caches, not the default.
* ``decode_attention_paged`` — the paged-cache kernel (non-contiguous pages
  via a page table); per-(slot, head) grid cells make it the right shape for
  large-group GQA, but DMA-latency-bound for MHA.

The einsum is the engine default: on TPU+XLA a rank-1, bandwidth-bound
decode belongs to the XLA fusion engine (it fuses the dequant convert and
the per-layer cache slice that a pallas operand forces into copies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import use_interpret
from ..kernels.vanilla import DEFAULT_MASK_VALUE
from .kv_cache import KVCache


def _einsum_attend(q4, k, v, k_scale, v_scale, lengths, sm_scale, quantized):
    """Shared einsum body over a slot range.

    q4: [S, Hkv, G, D]; k/v: [Hkv, S, L, D]; scales [Hkv, S, L] (or None);
    lengths [S].  Returns [S, Hkv, G, D] fp32.
    """
    scores = jnp.einsum(
        "shgd,hsld->shgl", q4, k.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if quantized:
        # fold K dequant scale per cached token (column of scores)
        scores = scores * jnp.swapaxes(k_scale, 0, 1)[:, :, None, :]

    valid = (
        jnp.arange(k.shape[2])[None, :] <= lengths[:, None]
    )  # [S, L]
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    p = jax.nn.softmax(scores, axis=-1)
    if quantized:
        p = p * jnp.swapaxes(v_scale, 0, 1)[:, :, None, :]
    return jnp.einsum(
        "shgl,hsld->shgd", p.astype(q4.dtype), v.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )


def decode_attention(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """q: [slots, q_heads, head_dim] (one token per slot) -> same shape.

    Each slot attends to its first `lengths[slot] + 1` cache entries — the
    +1 is the current token, which the caller has already written at
    position lengths[slot] via decode_write.
    """
    s, hq, d = q.shape
    hkv = cache.kv_heads
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5

    q4 = q.reshape(s, hkv, group, d)
    out = _einsum_attend(
        q4,
        cache.k[layer],
        cache.v[layer],
        cache.k_scale[layer] if cache.quantized else None,
        cache.v_scale[layer] if cache.quantized else None,
        cache.lengths,
        sm_scale,
        cache.quantized,
    )
    return out.reshape(s, hq, d).astype(q.dtype)


def decode_attention_chunked(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    sm_scale: float | None = None,
    chunk: int = 64,
) -> jax.Array:
    """Einsum decode attention computed in static slot chunks of `chunk`.

    Motivation (BASELINE.md round-5 decode scaling): XLA's fused
    decode-attention strategy on this toolchain degenerates past 64 slots
    (slots96/128 collapse from ~9.1k to ~0.7k tok/s).  Splitting the slot
    axis into static <=64-slot chunks keeps every einsum inside the regime
    where XLA picks the fast strategy; the chunk slices are static views
    that fuse into the dots (no extra HBM pass).  Falls back to the plain
    einsum when slots <= chunk.  Non-multiples run a ragged tail chunk.
    """
    s, hq, d = q.shape
    if s <= chunk:
        return decode_attention(q, cache, layer, sm_scale=sm_scale)
    hkv = cache.kv_heads
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5

    k, v = cache.k[layer], cache.v[layer]  # [Hkv, S, L, D]
    ks = cache.k_scale[layer] if cache.quantized else None
    vs = cache.v_scale[layer] if cache.quantized else None
    q4 = q.reshape(s, hkv, group, d)
    outs = []
    for lo in range(0, s, chunk):
        hi = min(lo + chunk, s)
        outs.append(
            _einsum_attend(
                q4[lo:hi],
                k[:, lo:hi],
                v[:, lo:hi],
                ks[:, lo:hi] if ks is not None else None,
                vs[:, lo:hi] if vs is not None else None,
                cache.lengths[lo:hi],
                sm_scale,
                cache.quantized,
            )
        )
    out = jnp.concatenate(outs, axis=0)
    return out.reshape(s, hq, d).astype(q.dtype)


def decode_attention_paged(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    page_size: int = 128,
    sm_scale: float | None = None,
    pages_per_compute_block: int = 8,
) -> jax.Array:
    """Decode attention through the paged Pallas kernel (zero-copy page view
    of the slot cache).  Reads only pages up to each slot's length and
    streams quantized payloads at 1 byte/elem.

    Small head dims (64, 32, ...) are lane-packed into 128-wide page rows
    inside paged_attention (Mosaic page-DMA alignment); head dims that
    neither divide nor are a multiple of 128 fall back to the einsum path.
    """
    from . import kv_cache as kvc
    from .paged_attention import paged_attention

    d = q.shape[-1]
    if d % 128 and (128 % d or page_size % (128 // max(d, 1))):
        return decode_attention(q, cache, layer, sm_scale=sm_scale)

    kp, vp, ks, vs = kvc.page_view(cache, layer, page_size)
    pi = kvc.identity_page_indices(cache.slots, cache.max_len, page_size)
    return paged_attention(
        q,
        kp,
        vp,
        cache.lengths + 1,  # current token already written at pos lengths
        pi,
        k_scales=ks,
        v_scales=vs,
        sm_scale=sm_scale,
        pages_per_compute_block=pages_per_compute_block,
    )


# ---------------------------------------------------------------------------
# Fused-heads slot-major decode kernel
# ---------------------------------------------------------------------------


def _fused_kernel(
    # scalar prefetch
    totals_ref,  # [slots] int32: valid tokens incl. the current one
    # inputs
    q_ref,  # [1, hkv, pack*group, 128] VMEM (parity-padded rows, pre-scaled)
    k_hbm,  # [hkv, slots, L/pack, d*pack] HBM (lane-packed view)
    v_hbm,
    ks_hbm,  # [slots, nblocks, pack, hkv*bkp] f32, score-column order
    vs_hbm,  # (quant only; else [1, 1, 1, 1] placeholders)
    # outputs
    o_ref,  # [1, hq, d] VMEM
    # scratch
    m_scr,  # [hkv*pack*group, 128] f32
    l_scr,
    acc_scr,  # [hkv*pack*group, 128] f32 (parity-padded lanes)
    k_buf,  # [2, hkv, bkp, 128] VMEM
    v_buf,
    ks_buf,  # [2, pack, hkv*bkp] VMEM f32
    vs_buf,
    buf_idx,  # SMEM [1] int32
    k_sems,  # [2] DMA sems per stream
    v_sems,
    ks_sems,
    vs_sems,
    *,
    slots: int,
    hkv: int,
    group: int,
    d: int,
    pack: int,
    block: int,
    nblocks: int,
    quantized: bool,
):
    """One grid cell = one (slot, token-block) for ALL kv heads — and ONE
    matmul pair per cell, not one per head.

    Token t of the sequence lives in packed row t//pack, lane group t%pack
    of the [L/pack, d*pack] view (free row-major reshape).  Query rows are
    pre-packed host-side: row r = h*pg + e*group + m holds q for query head
    h*group+m in lanes [e*d, (e+1)*d).  The whole-cell score matmul is
    Q_all [hkv*pg, 128] @ K_flat^T [hkv*bkp, 128]: column c = h'*bkp + cc
    of row r is q . k_{head h', token j*block + pack*cc + e} — only the
    block-diagonal (h == h') entries are wanted, and the mask kills the
    rest, so after exp the off-diagonal weights are exactly zero and the
    single PV matmul P @ V_flat accumulates only the right head's values.
    The hkv-fold extra MXU work is ~0.1 us/cell — far cheaper than the
    per-head op dispatch it replaces (measured 3.1 -> ~1 ms/tok GPT-2).
    The pack parities of one query reduce together in the online softmax
    (they are token subsets of the same row); the final store folds parity
    lane-segments back with tiny one-hot matmuls.
    """
    b, j = pl.program_id(0), pl.program_id(1)
    pg = pack * group
    bkp = block // pack
    total = totals_ref[b]

    def copies(bb, jj, slot):
        sl = pl.ds(jj * bkp, bkp)
        out = [
            pltpu.make_async_copy(
                k_hbm.at[:, bb, sl, :], k_buf.at[slot], k_sems.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, bb, sl, :], v_buf.at[slot], v_sems.at[slot]
            ),
        ]
        if quantized:
            out.append(
                pltpu.make_async_copy(
                    ks_hbm.at[bb, jj], ks_buf.at[slot], ks_sems.at[slot]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    vs_hbm.at[bb, jj], vs_buf.at[slot], vs_sems.at[slot]
                )
            )
        return out

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    is_first = jnp.logical_and(b == 0, j == 0)

    @pl.when(is_first)
    def _seed():
        buf_idx[0] = 0
        for c in copies(0, 0, 0):
            c.start()

    @pl.when(j * block < total)
    def _compute():
        slot = buf_idx[0]

        # Prefetch the next computing cell into the other buffer half.
        more_here = (j + 1) * block < total
        nb = jnp.where(more_here, b, b + 1)
        nj = jnp.where(more_here, j + 1, 0)

        @pl.when(nb < slots)
        def _prefetch():
            for c in copies(nb, nj, 1 - slot):
                c.start()

        cps = copies(b, j, slot)
        cps[0].wait()  # K payload
        if quantized:
            cps[2].wait()  # K scales

        rows, cols = hkv * pg, hkv * bkp
        qa = q_ref[0].reshape(rows, 128)  # Q_all, pre-scaled by sm_scale
        kf = k_buf[slot].reshape(cols, 128)
        s = jax.lax.dot_general(
            qa, kf.astype(qa.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, cols]: col h'*bkp+cc of row (h,e,m)

        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        e_r = (ri % pg) // group  # row parity
        tok = j * block + pack * (ci % bkp) + e_r
        valid = jnp.logical_and(ri // pg == ci // bkp, tok < total)
        if quantized:
            # [pack, cols] scales already in score-column order; the row
            # pattern repeats per head-block of pg rows (row parity picks
            # the scale row).
            ksf = ks_buf[slot]
            s = s * jnp.broadcast_to(
                ksf[None, :, None, :], (hkv, pack, group, cols)
            ).reshape(rows, cols)
        s = s + jnp.where(valid, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]  # [rows, 128] lane-replicated per query
        l_prev = l_scr[...]
        # One query's parities reduce together: max over its pack rows.
        m_curr = jnp.max(
            s.reshape(hkv, pack, group, cols), axis=(1, 3)
        )  # [hkv, group]
        m_curr = jnp.broadcast_to(
            m_curr[:, None, :, None], (hkv, pack, group, 128)
        ).reshape(rows, 128)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])  # off-diagonal blocks exp to 0
        l_curr = jnp.sum(p.reshape(hkv, pack, group, cols), axis=(1, 3))
        l_curr = jnp.broadcast_to(
            l_curr[:, None, :, None], (hkv, pack, group, 128)
        ).reshape(rows, 128)
        l_scr[...] = alpha * l_prev + l_curr
        m_scr[...] = m_next

        cps[1].wait()  # V payload
        if quantized:
            cps[3].wait()  # V scales
            vsf = vs_buf[slot]
            p = p * jnp.broadcast_to(
                vsf[None, :, None, :], (hkv, pack, group, cols)
            ).reshape(rows, cols)
        vf = v_buf[slot].reshape(cols, 128)
        # Off-diagonal p entries are zero, so the single matmul accumulates
        # only the matching head's values; row (h,e,m) is valid in lane
        # segment e (the parity fold happens at the store).
        pv_dtype = jnp.bfloat16 if vf.dtype == jnp.int8 else vf.dtype
        o = jax.lax.dot(
            p.astype(pv_dtype), vf.astype(pv_dtype),
            preferred_element_type=jnp.float32,
        )  # [rows, 128]
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + o
        buf_idx[0] = 1 - slot

    @pl.when(j == nblocks - 1)
    def _store():
        rows = hkv * pg
        hq = hkv * group
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        acc = acc_scr[...] / l_safe  # [rows, 128]
        if pack == 1:
            # rows already are query heads and lanes [0, d) are the output
            o_ref[...] = acc[:, :d].reshape(1, hq, d).astype(o_ref.dtype)
            return
        # Fold parity lane-segments with one-hot selectors (avoids sub-128
        # lane slices): out = sum_e R_e @ acc @ S_e, where R_e picks row
        # h*pg + e*group + m for query h*group+m and S_e shifts lanes
        # [e*d, (e+1)*d) down to [0, d).
        li = jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (128, d), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (hq, rows), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (hq, rows), 1)
        out = None
        for e in range(pack):
            sel = (li == e * d + ci).astype(jnp.float32)
            rsel = (
                rj == (qi // group) * pg + e * group + qi % group
            ).astype(jnp.float32)
            part = jax.lax.dot(
                rsel,
                jax.lax.dot(acc, sel, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [hq, d]
            out = part if out is None else out + part
        o_ref[...] = out[None].astype(o_ref.dtype)


def decode_attention_fused(
    q: jax.Array,
    cache: KVCache,
    layer: int,
    *,
    sm_scale: float | None = None,
    block: int = 512,
) -> jax.Array:
    """Slot-major fused-heads decode attention.

    q: [slots, q_heads, head_dim] -> same shape.  Reads each slot's cache
    only up to its length (block granularity), streams quantized payloads at
    1 byte/elem with dequant fused in VMEM, and lane-packs head dims < 128
    to satisfy Mosaic's 128-aligned trailing-extent DMA rule.  Falls back to
    the einsum path for head dims that do not divide 128.

    NOT the default: measured slower than decode_attention (einsum) on v5e
    — in a decode scan the per-layer cache slice a pallas operand requires
    becomes a real copy, and the strided per-head DMA streams below XLA's
    fused contiguous read (BASELINE.md).  It wins only when contexts are
    far shorter than cache capacity (length-adaptive reads).
    """
    s, hq, dd = q.shape
    hkv = cache.kv_heads
    group = hq // hkv
    ll = cache.max_len
    if sm_scale is None:
        sm_scale = float(dd) ** -0.5
    if (dd % 128 == 0 and dd != 128) or (dd % 128 and 128 % dd):
        return decode_attention(q, cache, layer, sm_scale=sm_scale)
    pack = 128 // dd if dd < 128 else 1
    # Cap the VMEM K/V buffers (2 halves x 2 streams x hkv x block/pack x
    # 128 lanes) at ~4 MB: shrink the block for many-head caches (Llama).
    cap = max((8192 // hkv) // 128 * 128 * pack, 128 * pack)
    block_ = min(block, ll, cap)
    if ll % max(block_, pack) or block_ % pack:
        return decode_attention(q, cache, layer, sm_scale=sm_scale)
    nblocks = ll // block_
    bkp = block_ // pack
    pg = pack * group
    quantized = cache.quantized

    # Lane-packed per-layer payload views (free row-major reshapes).
    # (Passing the full unsliced cache and indexing `layer` inside the
    # kernel was tried and is ~10x WORSE: inside a decode scan XLA inserts
    # defensive whole-cache copies around the pallas call because the same
    # buffer is scatter-updated each step.  The per-layer slice copy is the
    # lesser cost.)
    k = cache.k[layer].reshape(hkv, s, ll // pack, dd * pack)
    v = cache.v[layer].reshape(hkv, s, ll // pack, dd * pack)
    if quantized:
        # Block-major, score-column-order scale layout
        # [slots, nblocks, pack, hkv*bkp]: entry (b, j, e, h*bkp + cc)
        # dequantizes head h, token j*block + pack*cc + e — the kernel DMAs
        # one full trailing slab per cell, no in-kernel permute.
        # Materializes ~2*S*L f32 per layer, ~1% of the payload stream.
        def _col_order(sc):
            return (
                sc.reshape(hkv, s, nblocks, bkp, pack)
                .transpose(1, 2, 4, 0, 3)
                .reshape(s, nblocks, pack, hkv * bkp)
            )

        ks = _col_order(cache.k_scale[layer])
        vs = _col_order(cache.v_scale[layer])
    else:
        ks = vs = jnp.zeros((1, 1, 1, 1), jnp.float32)

    # Parity-padded query rows: row e*group+m of head h holds q[h*group+m]
    # scaled by sm_scale in lanes [e*d, (e+1)*d).
    q4 = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    q4 = q4.reshape(s, hkv, group, dd)
    qp = jnp.concatenate(
        [
            jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (e * dd, (pack - 1 - e) * dd)))
            for e in range(pack)
        ],
        axis=2,
    )  # [s, hkv, pack*group, 128] (parity-major rows)

    kernel = functools.partial(
        _fused_kernel,
        slots=s,
        hkv=hkv,
        group=group,
        d=dd,
        pack=pack,
        block=block_,
        nblocks=nblocks,
        quantized=quantized,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s, nblocks),
            in_specs=[
                pl.BlockSpec((1, hkv, pg, 128), lambda b, j, t: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, hq, dd), lambda b, j, t: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hkv * pg, 128), jnp.float32),
                pltpu.VMEM((hkv * pg, 128), jnp.float32),
                pltpu.VMEM((hkv * pg, 128), jnp.float32),
                pltpu.VMEM((2, hkv, bkp, 128), cache.k.dtype),
                pltpu.VMEM((2, hkv, bkp, 128), cache.v.dtype),
                pltpu.VMEM((2, pack, hkv * bkp), jnp.float32),
                pltpu.VMEM((2, pack, hkv * bkp), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s, hq, dd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(cache.lengths + 1, qp, k, v, ks, vs)
    return out
