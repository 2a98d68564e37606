"""FlashAttention-2 Pallas kernels for TPU.

TPU-native redesign of the reference Poplar kernels
(/root/reference/flash_attention_ipu/cpp/flash_attention_qkv_packed.cpp):

* The reference's nested Poplar ``Repeat`` loops over q/kv chunks with
  ``dynamicSlice`` (flash_attention_qkv_packed.cpp:311,328) become a Pallas
  grid ``(batch*kv_heads, num_q_blocks, num_kv_blocks)`` with BlockSpec-driven
  HBM->VMEM pipelining.
* The reference's causal block skip ``If(doBlock)`` when
  ``(i+1)*q_chunk <= j*kv_chunk`` (…:244,305) becomes ``pl.when`` predication
  on the same inequality.
* The reference's materialized triu mask blocks (…:47-159) are replaced by
  ``broadcasted_iota`` index comparisons computed in-register — a Poplar-ism
  with no reason to exist on TPU.
* The reference backward recomputes the full forward including out+lse
  (…:357).  We instead save ``(o, lse)`` as residuals (FlashAttention-2 style)
  and run two Pallas kernels — dKV (kv-outer/q-inner, mirroring the
  reference's loop order at …:410-497) and dQ (q-outer/kv-inner) — with
  ``di = rowsum(o * do)`` precomputed once (the reference's D at …:374-377).
* Online softmax identical in spirit to …:281-300: running max m, correction
  alpha = exp(m_prev - m_next), unnormalized accumulator, single final
  division (FlashAttention-2, as the reference notebook's appendix C notes).

Numerics: all softmax statistics and accumulators are fp32 VMEM scratch even
for bf16 inputs; matmuls use ``preferred_element_type=jnp.float32``.  This is
deliberately *stronger* than the reference, whose fp16 backward tolerance is
1e-0 (tests/cpp/test_flash_attention.cpp:292-295).

GQA is native: q is reshaped to [batch*kv_heads, q_per_kv, q_len, d] and the
q_per_kv group rides inside the kernel's row dimension, so QK^T is one
(q_per_kv*block_q, d) @ (d, block_kv) MXU matmul per tile and KV is never
duplicated.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import use_interpret
from .block_sizes import (
    MIN_BLOCK,
    BlockSizes,
    blocks_from_chunks,
    default_blocks,
    resolve_bwd_blocks,
)
from .vanilla import DEFAULT_MASK_VALUE, vanilla_attention

__all__ = ["flash_attention", "flash_attention_with_lse", "BlockSizes"]


@dataclasses.dataclass(frozen=True)
class _Params:
    """Static kernel configuration (hashable: rides custom_vjp nondiff args)."""

    sm_scale: float
    causal: bool
    q_len: int  # real (pre-padding) lengths, for masking
    kv_len: int
    blocks: BlockSizes
    # Sliding window: attend only to the last `window` positions (inclusive
    # of self); None = full causal.  Mistral-style local attention.
    window: int | None = None
    # Packed-sequence (segment-id) masking: kernels receive per-token segment
    # ids and tokens only attend within their segment.
    segmented: bool = False
    # Ones-column l: V is host-padded with a column of ones (+7 zeros to the
    # next 8-lane boundary) so the softmax row sum l accumulates as column d
    # of the PV matmul — on the MXU's otherwise-idle output lanes at d<=120
    # — instead of a VPU row reduction; the l scratch disappears (the alpha
    # correction applies to the whole accumulator, l included).  Numerics:
    # for bf16 inputs l sums the SAME bf16-rounded p the numerator uses
    # (self-consistent; within the bf16 parity tier).
    ones_l: bool = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Softmax runs in the exp2 domain: fold sm_scale * log2(e) into q once per
# tile ((rows, d) VPU mul) instead of scaling the full (rows, bkv) scores,
# and use exp2 directly — the TPU VPU computes exp via exp2, so this saves
# one full-tile multiply inside every exp as well.  Measured on v5e: +11%
# forward throughput at the headline shape.  lse converts back to natural
# log at the store (lse = ln2 * (m2 + log2 l2)).
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _mm_precision(dtype):
    """MXU precision for kernel matmuls, by input dtype.

    TPU fp32 matmuls default to a truncated bf16-pass mode; measured on v5e
    that leaves ~2e-2 abs error in fp32 gradients — far off the reference's
    fp32 parity tiers (1e-5 fwd / 1e-4 bwd, tests/cpp:245-287).  HIGHEST
    restores full fp32 multiply passes.  bf16 inputs are single-pass exact
    already, so they keep the fast default.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _mask_for_block(
    params: _Params,
    i,
    col_start,
    rows: int,
    bq: int,
    width: int,
    *,
    causal: bool,
    kv_mask: bool,
):
    """Combined causal + kv-length mask for one (rows, width) tile whose
    first column sits at absolute kv position `col_start`, or None.

    Index-arithmetic replacement for the reference's materialized mask blocks
    (cpp/flash_attention_qkv_packed.cpp:133-173).  ``rows = q_per_kv * bq``:
    all q heads in the GQA group share positions, so the row position is the
    row index modulo bq.
    """
    if not causal and not kv_mask:
        return None
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) % bq + i * bq
    col_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1) + col_start
    mask = None
    if causal:
        offset = params.kv_len - params.q_len
        mask = col_pos <= row_pos + offset
        if params.window is not None:
            mask = mask & (col_pos >= row_pos + offset - (params.window - 1))
    if kv_mask:
        pad_mask = col_pos < params.kv_len
        mask = pad_mask if mask is None else mask & pad_mask
    return mask


def _seg_mask(qseg_ref, kvseg_ref, col_start: int, width: int, group: int, bq: int):
    """Segment mask for one tile: True where q and kv tokens share a segment
    (multi-document packing, no cross-document attention).  Rows are
    group-major copies of the bq q positions, so the (bq, width) mask tiles
    `group` times.  col_start/width are static (inner-tile offsets)."""
    sq = qseg_ref[0].reshape(bq, 1)  # [bq, 1]
    skv = kvseg_ref[0, :, col_start:col_start + width]  # [1, width]
    mask = sq == skv
    return jnp.tile(mask, (group, 1)) if group > 1 else mask


def _fully_visible(params: _Params, i, j, bq: int, bkv: int):
    """Block needs no per-element mask: entirely below the diagonal and
    (with a sliding window) entirely inside every row's window."""
    offset = params.kv_len - params.q_len
    visible = (j + 1) * bkv - 1 <= i * bq + offset
    if params.window is not None:
        # worst row = last row of the q block (largest window start)
        visible = jnp.logical_and(
            visible,
            j * bkv >= (i + 1) * bq - 1 + offset - (params.window - 1),
        )
    return visible


def _dispatch_block(params: _Params, i, j, bq, bkv, nj, kv_padded, body):
    """Run `body(causal_mask, kv_mask)` predicated on the causal structure:
    skip above-diagonal blocks, apply the mask only where the diagonal or the
    kv padding boundary crosses the tile (reference skip: cpp …:244)."""
    if params.causal:
        run = _run_cond(params, i, j, bq, bkv)
        visible = _fully_visible(params, i, j, bq, bkv)
        if kv_padded:
            # Padding can span several tiles when this kernel's block is
            # smaller than the one that drove the padding, so mask every
            # tile that touches or crosses the kv boundary — not just the
            # last one.
            needs_mask = jnp.logical_or(
                jnp.logical_not(visible), (j + 1) * bkv > params.kv_len
            )
        else:
            needs_mask = jnp.logical_not(visible)

        @pl.when(jnp.logical_and(run, needs_mask))
        def _():
            body(True, kv_padded)

        @pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))
        def _():
            body(False, False)

    elif kv_padded:
        crosses_pad = (j + 1) * bkv > params.kv_len

        @pl.when(crosses_pad)
        def _():
            body(False, True)

        @pl.when(jnp.logical_not(crosses_pad))
        def _():
            body(False, False)

    else:
        body(False, False)


def _run_cond(params: _Params, i, j, bq: int, bkv: int):
    """Causal block-skip predicate: same inequality as the reference's
    ``If(doBlock)`` (cpp/flash_attention_qkv_packed.cpp:244), generalized for
    q_len != kv_len (queries aligned to the end of the KV sequence) and for
    sliding windows (skip blocks entirely behind every row's window too)."""
    offset = params.kv_len - params.q_len
    run = j * bkv <= (i + 1) * bq - 1 + offset
    if params.window is not None:
        # block's last col must reach the first row's window start
        run = jnp.logical_and(
            run, (j + 1) * bkv - 1 >= i * bq + offset - (params.window - 1)
        )
    return run


def _last_kv_block(params: _Params, nj: int, bq: int, bkv: int, i):
    """Last kv block index that q block i attends to (causal)."""
    offset = params.kv_len - params.q_len
    return jnp.clip(((i + 1) * bq - 1 + offset) // bkv, 0, nj - 1)


def _first_kv_block(params: _Params, nj: int, bq: int, bkv: int, i):
    """First kv block q block i attends to (0 unless sliding window)."""
    if params.window is None:
        return 0
    offset = params.kv_len - params.q_len
    return jnp.clip(
        (i * bq + offset - (params.window - 1)) // bkv, 0, nj - 1
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, body):
    """Block dispatch for compact grids: every visited cell runs; only the
    mask decision remains (diagonal/window/pad-crossing tiles pay it)."""
    visible = _fully_visible(params, i, j, bq, bkv)
    if kv_padded:
        # Mask every tile touching the kv boundary (padding can span
        # multiple tiles of a smaller-blocked kernel; see _dispatch_block).
        needs_mask = jnp.logical_or(
            jnp.logical_not(visible), (j + 1) * bkv > params.kv_len
        )
    else:
        needs_mask = jnp.logical_not(visible)

    @pl.when(needs_mask)
    def _():
        body(True, kv_padded)

    @pl.when(jnp.logical_not(needs_mask))
    def _():
        body(False, False)


def _fwd_kernel(
    *refs,
    params: _Params,
    nj: int,
    kv_padded: bool,
    ncells: int | None = None,
    with_lse: bool = True,
    single_pass: bool = False,
):
    """Forward kernel.

    Rectangular mode (ncells=None): grid (BH, ni, nj), refs are
    (q, k, v, o, lse, m, l, acc).  Compact mode: grid (BH, ncells) walking
    exactly the causal cells; refs gain leading (i_tab, j_tab) scalar refs,
    and the accumulator init/store conditions come from table transitions
    instead of j==0 / j==nj-1.  with_lse=False drops the lse output — the
    extra output stream costs ~8% forward throughput (measured on v5e), so
    the inference/primal path omits it.

    single_pass=True (set when nj == 1, i.e. every q row sees exactly one
    kv cell — the GPT-2 train-shape geometry): direct softmax with NO
    scratch at all.  The running-stats machinery (m/l/acc init, the
    read-modify-write of the fp32 accumulator, the alpha correction) is
    pure overhead when a row is one cell; dropping it measures ~8% on
    the shipped kernel at b8 h12 L1024 D64, ratio-anchored against a
    fixed multi-cell tiling (the +29% in bench/exp_layout.py v3 belonged
    to a variant with two extra simplifications — BASELINE.md round 4).
    """
    nseg = 2 if params.segmented else 0
    nout = 2 if with_lse else 1
    if ncells is None:
        q_ref, k_ref, v_ref = refs[:3]
        qseg_ref, kvseg_ref = refs[3:5] if nseg else (None, None)
        outs = refs[3 + nseg:3 + nseg + nout]
        scrs = refs[3 + nseg + nout:]
        i, j = pl.program_id(1), pl.program_id(2)
        init_cond = j == 0
        store_cond = j == nj - 1
    else:
        i_tab, j_tab, q_ref, k_ref, v_ref = refs[:5]
        qseg_ref, kvseg_ref = refs[5:7] if nseg else (None, None)
        outs = refs[5 + nseg:5 + nseg + nout]
        scrs = refs[5 + nseg + nout:]
        c = pl.program_id(1)
        i, j = i_tab[c], j_tab[c]
        init_cond = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
        store_cond = jnp.logical_or(
            c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
        )
    o_ref = outs[0]
    lse_ref = outs[1] if with_lse else None
    bq, bkv = params.blocks.block_q, params.blocks.block_kv
    group, d = q_ref.shape[1], q_ref.shape[3]
    rows = group * bq

    def score_tile(causal_mask: bool, kv_mask: bool):
        """q @ k^T for this tile, exp2-domain scaled in-register, masked.

        The sm_scale*log2(e) fold happens HERE on the (rows, d) VMEM tile
        — not as a host-side pass over q, which cost a full q read+write
        per layer (round 4; the tile mul is ~bkv/d times cheaper than
        scaling the scores and reuses the already-loaded tile)."""
        q = q_ref[0].reshape(rows, d)
        q = (q.astype(jnp.float32) * (params.sm_scale * _LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(q.dtype),
        )
        mask = _mask_for_block(
            params, i, j * bkv, rows, bq, bkv,
            causal=causal_mask, kv_mask=kv_mask,
        )
        if mask is not None:
            s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
        if params.segmented:
            seg = _seg_mask(qseg_ref, kvseg_ref, 0, bkv, group, bq)
            s = s + jnp.where(seg, 0.0, DEFAULT_MASK_VALUE)
        return s

    if single_pass:
        def single_body(causal_mask: bool, kv_mask: bool):
            s = score_tile(causal_mask, kv_mask)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot(
                p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32,
                precision=_mm_precision(v_ref.dtype),
            )
            if params.ones_l:
                l = acc[:, d:d + 1]  # the ones column of the padded V
            else:
                l = jnp.sum(p, axis=-1, keepdims=True)
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[...] = (
                (acc[:, :d] / l_safe).reshape(1, group, bq, d).astype(o_ref.dtype)
            )
            if with_lse:
                lse = (m + jnp.log2(l_safe)) * _LN2
                lse_ref[...] = lse.reshape(1, group, bq)

        if ncells is None:
            _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, single_body)
        else:
            _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, single_body)
        return

    if params.ones_l:
        m_scr, acc_scr = scrs
        l_scr = None
    else:
        m_scr, l_scr, acc_scr = scrs

    @pl.when(init_cond)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        if l_scr is not None:
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(causal_mask: bool, kv_mask: bool):
        # "attn_ij = q_i @ k_j.T" (cf. …cpp:254), exp2-domain (score_tile).
        # (A two-level kv tiling — sub-tile loop inside the bkv block, meant
        # to overlap sub-tile QK^T with the previous sub-tile's softmax —
        # was implemented and swept on v5e: 42-34 TF/s vs 63 single-level at
        # the headline shape.  Mosaic does not interleave the streams, so
        # the split only adds per-sub-tile reduction overhead; removed.)
        s = score_tile(causal_mask, kv_mask)

        m_prev = m_scr[...]  # (rows, 128), lane-replicated
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # (rows, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)  # correction c = exp(m_i - m_new)
        p = jnp.exp2(s - m_next[:, 0:1])
        m_scr[...] = m_next
        if l_scr is not None:
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=-1, keepdims=True)
        # o_i = c * o_i + attn_ij @ v_j (unnormalized; one final divide).
        # With ones_l the padded V's ones column makes acc[:, d] carry l
        # through the same alpha corrections — no separate l update.
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
            precision=_mm_precision(v_ref.dtype),
        )

    if ncells is None:
        _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, body)
    else:
        _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, body)

    @pl.when(store_cond)
    def _store():
        if params.ones_l:
            l = acc_scr[:, d:d + 1]  # the ones column of the padded V
        else:
            l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (
            (acc_scr[:, :d] / l_safe).reshape(1, group, bq, d).astype(o_ref.dtype)
        )
        if with_lse:
            # lse = m + log(l), converted from the exp2 domain (cf. …cpp:316)
            lse = (m_scr[:, 0:1] + jnp.log2(l_safe)) * _LN2
            lse_ref[...] = lse.reshape(1, group, bq)


def _causal_cells_qmajor(params: _Params, ni: int, nj: int, bq: int, bkv: int):
    """Host-side cell list for causal grids, q-major: exactly the (i, j)
    blocks the mask admits, in scratch-accumulation order.  The compact-grid
    replacement for iterating a rectangle and predicating (saves both the
    empty-cell grid steps and their pipeline slots)."""
    import numpy as np

    offset = params.kv_len - params.q_len
    ci, cj = [], []
    for i in range(ni):
        j1 = min(max(((i + 1) * bq - 1 + offset) // bkv, 0), nj - 1)
        j0 = 0
        if params.window is not None:
            j0 = min(max((i * bq + offset - (params.window - 1)) // bkv, 0), j1)
        for j in range(j0, j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def _fwd(params: _Params, q, k, v, qseg=None, kvseg=None, need_lse=True):
    """q: [BH, group, Lq, D]; k, v: [BH, Lkv, D]; optional segment ids
    qseg [BH, 1, Lq], kvseg [BH, 1, Lkv] (padded, aligned).  Returns
    (out, lse); lse is None when need_lse=False (the second output stream
    costs ~8% throughput, so the inference path drops it).

    q arrives RAW: the exp2-domain sm_scale*log2(e) fold happens on the
    (rows, d) tile inside the kernel (score_tile) — a host-side pass here
    cost a full q read+write per call when no padding copy absorbed it."""
    bh, group, lq, d = q.shape
    lk = k.shape[1]
    bq, bkv = params.blocks.block_q, params.blocks.block_kv
    ni, nj = lq // bq, lk // bkv
    kv_padded = lk != params.kv_len
    # nj == 1: every q row sees exactly one kv cell, so the online-softmax
    # running stats are pure overhead — the kernel takes a no-scratch
    # direct-softmax path (~8% measured at the GPT-2 train shape).
    single_pass = nj == 1
    dv = d
    if params.ones_l:
        # Pad V with [1, 0*7]: column d of the PV matmul then accumulates
        # the softmax row sum l on otherwise-idle MXU output lanes.
        dv = d + 8
        v = jnp.concatenate(
            [
                v,
                jnp.ones((bh, lk, 1), v.dtype),
                jnp.zeros((bh, lk, 7), v.dtype),
            ],
            axis=-1,
        )
    out_shape = [
        jax.ShapeDtypeStruct((bh, group, lq, d), q.dtype),
        jax.ShapeDtypeStruct((bh, group, lq), jnp.float32),
    ]
    if not need_lse:
        out_shape = out_shape[:1]
    scratch = (
        []
        if single_pass
        else [
            pltpu.VMEM((group * bq, 128), jnp.float32),
            *(
                []
                if params.ones_l
                else [pltpu.VMEM((group * bq, 128), jnp.float32)]
            ),
            pltpu.VMEM((group * bq, dv), jnp.float32),
        ]
    )
    seg_in = (qseg, kvseg) if params.segmented else ()
    if params.causal:
        # Compact grid: visit exactly the causal/window cells.
        ci, cj = _causal_cells_qmajor(params, ni, nj, bq, bkv)
        ncells = len(ci)
        kernel = functools.partial(
            _fwd_kernel, params=params, nj=nj, kv_padded=kv_padded,
            ncells=ncells, with_lse=need_lse, single_pass=single_pass,
        )
        seg_specs = (
            [
                pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
                pl.BlockSpec((1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
            ]
            if params.segmented
            else []
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh, ncells),
                in_specs=[
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                    pl.BlockSpec((1, bkv, dv), lambda b, c, it, jt: (b, jt[c], 0)),
                    *seg_specs,
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec(
                        (1, group, bq), lambda b, c, it, jt: (b, 0, it[c])
                    ),
                ][: len(out_shape)],
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=use_interpret(),
        )(jnp.asarray(ci), jnp.asarray(cj), q, k, v, *seg_in)
        return (res[0], res[1]) if need_lse else (res[0], None)

    kernel = functools.partial(
        _fwd_kernel, params=params, nj=nj, kv_padded=kv_padded,
        with_lse=need_lse, single_pass=single_pass,
    )
    seg_specs = (
        [
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bkv), lambda b, i, j: (b, 0, j)),
        ]
        if params.segmented
        else []
    )
    res = pl.pallas_call(
        kernel,
        grid=(bh, ni, nj),
        in_specs=[
            pl.BlockSpec((1, group, bq, d), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, dv), lambda b, i, j: (b, j, 0)),
            *seg_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, d), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda b, i, j: (b, 0, i)),
        ][: len(out_shape)],
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(q, k, v, *seg_in)
    return (res[0], res[1]) if need_lse else (res[0], None)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _rowcol(ref, group: int, bq: int):
    """Load a (1, group, bq) ref as a (group*bq, 1) column.

    Mosaic rejects the direct lane-collapsing reshape (group, bq) ->
    (group*bq, 1) when group > 1 ("infer-vector-layout: unsupported shape
    cast"); per-group (1, bq) -> (bq, 1) casts + a sublane concat compile.
    """
    if group == 1:
        return ref[0].reshape(bq, 1)
    parts = [ref[0, g : g + 1, :].reshape(bq, 1) for g in range(group)]
    return jnp.concatenate(parts, axis=0)


def _recompute_p(
    params, q_ref, k_ref, lse_ref, i, j, rows, d, bq, bkv, causal_mask, kv_mask,
    qseg_ref=None, kvseg_ref=None,
):
    """attn = exp(q @ k^T * scale - lse), masked, via the exp2 domain:
    p = exp2(qs @ k^T - lse*log2e) with qs = q * scale*log2e computed
    in-register on the (rows, d) tile (cf. …cpp:457-459).  Returns
    (p, q_raw, k): q_raw is UNSCALED, so dk = ds^T @ q_raw needs no
    unscale at the store."""
    q = q_ref[0].reshape(rows, d)
    qs = (q.astype(jnp.float32) * (params.sm_scale * _LOG2E)).astype(q.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(q.dtype),
    )
    mask = _mask_for_block(
        params, i, j * bkv, rows, bq, bkv, causal=causal_mask, kv_mask=kv_mask
    )
    if mask is not None:
        s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
    if params.segmented:
        seg = _seg_mask(qseg_ref, kvseg_ref, 0, bkv, rows // bq, bq)
        s = s + jnp.where(seg, 0.0, DEFAULT_MASK_VALUE)
    lse = _rowcol(lse_ref, rows // bq, bq)
    return jnp.exp2(s - lse * _LOG2E), q, k


def _dkv_kernel(
    *refs,
    params: _Params,
    ni: int,
    nj: int,
    kv_padded: bool,
    ncells: int | None = None,
    single_pass: bool = False,
):
    """dK/dV: kv block pinned, iterate q blocks — the reference's kv-outer /
    q-inner loop order (cpp/flash_attention_qkv_packed.cpp:410-497).
    Compact mode walks only the admitted cells, kv-major.

    single_pass=True (ni == 1: one q cell per kv block): dk/dv are computed
    and stored directly, no scratch accumulators (see _fwd_kernel)."""
    nseg = 2 if params.segmented else 0
    if ncells is None:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = refs[:6]
        qseg_ref, kvseg_ref = refs[6:8] if nseg else (None, None)
        rest = refs[6 + nseg:]
        j, i = pl.program_id(1), pl.program_id(2)
        init_cond = i == 0
        store_cond = i == ni - 1
    else:
        (j_tab, i_tab, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref) = refs[:8]
        qseg_ref, kvseg_ref = refs[8:10] if nseg else (None, None)
        rest = refs[8 + nseg:]
        c = pl.program_id(1)
        j, i = j_tab[c], i_tab[c]
        init_cond = jnp.logical_or(c == 0, j_tab[jnp.maximum(c - 1, 0)] != j)
        store_cond = jnp.logical_or(
            c == ncells - 1, j_tab[jnp.minimum(c + 1, ncells - 1)] != j
        )
    bq, bkv = params.blocks.bwd_dkv()
    group, d = q_ref.shape[1], q_ref.shape[3]
    rows = group * bq

    if single_pass:
        dk_ref, dv_ref = rest

        def single_body(causal_mask: bool, kv_mask: bool):
            p, q, _ = _recompute_p(
                params, q_ref, k_ref, lse_ref, i, j, rows, d, bq, bkv,
                causal_mask, kv_mask, qseg_ref, kvseg_ref,
            )
            do = do_ref[0].reshape(rows, d)
            dv = jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(do.dtype),
            )
            dv_ref[...] = dv.reshape(1, bkv, d).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                do, v_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(do.dtype),
            )
            di = _rowcol(di_ref, rows // bq, bq)
            # sm_scale folded into the (rows, d) q tile, not the
            # (rows, bkv) ds tile — bkv/d times fewer multiplies
            ds = p * (dp - di)
            qs = (q.astype(jnp.float32) * params.sm_scale).astype(q.dtype)
            dk = jax.lax.dot_general(
                ds.astype(q.dtype), qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(q.dtype),
            )
            dk_ref[...] = dk.reshape(1, bkv, d).astype(dk_ref.dtype)

        if ncells is None:
            _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, single_body)
        else:
            _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, single_body)
        return

    dk_ref, dv_ref, dk_scr, dv_scr = rest

    @pl.when(init_cond)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    def body(causal_mask: bool, kv_mask: bool):
        p, q, _ = _recompute_p(
            params, q_ref, k_ref, lse_ref, i, j, rows, d, bq, bkv,
            causal_mask, kv_mask, qseg_ref, kvseg_ref,
        )
        do = do_ref[0].reshape(rows, d)
        # dv += attn^T @ dO  (cf. …cpp:462)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype),
            do,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(do.dtype),
        )
        # dattn = (dO @ v^T - D) * attn  (cf. …cpp:465-467)
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(do.dtype),
        )
        di = _rowcol(di_ref, rows // bq, bq)
        # sm_scale folded into the (rows, d) q tile (see single-pass note)
        ds = p * (dp - di)
        qs = (q.astype(jnp.float32) * params.sm_scale).astype(q.dtype)
        # dk += dattn^T @ q  (cf. …cpp:472)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype),
            qs,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(q.dtype),
        )

    if ncells is None:
        _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, body)
    else:
        _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, body)

    @pl.when(store_cond)
    def _store():
        # dk accumulated against the RAW q (the exp2-domain scaling lives
        # inside _recompute_p's score matmul only) — no unscale needed.
        dk_ref[...] = dk_scr[...].reshape(1, bkv, d).astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[...].reshape(1, bkv, d).astype(dv_ref.dtype)


def _dq_kernel(
    *refs,
    params: _Params,
    nj: int,
    kv_padded: bool,
    ncells: int | None = None,
    single_pass: bool = False,
):
    """dQ: q block pinned, iterate kv blocks (cf. …cpp:470 accumulation).
    Compact mode walks only the admitted cells, q-major.

    single_pass=True (nj == 1: one kv cell per q block): dq is computed and
    stored directly, no scratch accumulator (see _fwd_kernel)."""
    nseg = 2 if params.segmented else 0
    if ncells is None:
        q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = refs[:6]
        qseg_ref, kvseg_ref = refs[6:8] if nseg else (None, None)
        rest = refs[6 + nseg:]
        i, j = pl.program_id(1), pl.program_id(2)
        init_cond = j == 0
        store_cond = j == nj - 1
    else:
        (i_tab, j_tab, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref) = refs[:8]
        qseg_ref, kvseg_ref = refs[8:10] if nseg else (None, None)
        rest = refs[8 + nseg:]
        c = pl.program_id(1)
        i, j = i_tab[c], j_tab[c]
        init_cond = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
        store_cond = jnp.logical_or(
            c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
        )
    bq, bkv = params.blocks.bwd_dq()
    group, d = q_ref.shape[1], q_ref.shape[3]
    rows = group * bq

    if single_pass:
        (dq_ref,) = rest

        def single_body(causal_mask: bool, kv_mask: bool):
            p, _, k = _recompute_p(
                params, q_ref, k_ref, lse_ref, i, j, rows, d, bq, bkv,
                causal_mask, kv_mask, qseg_ref, kvseg_ref,
            )
            do = do_ref[0].reshape(rows, d)
            dp = jax.lax.dot_general(
                do, v_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(do.dtype),
            )
            di = _rowcol(di_ref, rows // bq, bq)
            # sm_scale folded into the (bkv, d) k tile, not the ds tile
            ds = p * (dp - di)
            ks = (k.astype(jnp.float32) * params.sm_scale).astype(k.dtype)
            dq = jax.lax.dot(
                ds.astype(k.dtype), ks,
                preferred_element_type=jnp.float32,
                precision=_mm_precision(k.dtype),
            )
            dq_ref[...] = dq.reshape(1, group, bq, d).astype(dq_ref.dtype)

        if ncells is None:
            _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, single_body)
        else:
            _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, single_body)
        return

    dq_ref, dq_scr = rest

    @pl.when(init_cond)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    def body(causal_mask: bool, kv_mask: bool):
        p, _, k = _recompute_p(
            params, q_ref, k_ref, lse_ref, i, j, rows, d, bq, bkv,
            causal_mask, kv_mask, qseg_ref, kvseg_ref,
        )
        do = do_ref[0].reshape(rows, d)
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(do.dtype),
        )
        di = _rowcol(di_ref, rows // bq, bq)
        # sm_scale folded into the (bkv, d) k tile (see single-pass note)
        ds = p * (dp - di)
        ks = (k.astype(jnp.float32) * params.sm_scale).astype(k.dtype)
        # dq += dattn @ k  (cf. …cpp:470)
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), ks,
            preferred_element_type=jnp.float32,
            precision=_mm_precision(k.dtype),
        )

    if ncells is None:
        _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, body)
    else:
        _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, body)

    @pl.when(store_cond)
    def _store():
        dq_ref[...] = dq_scr[...].reshape(1, group, bq, d).astype(dq_ref.dtype)


def _causal_cells_kvmajor(params: _Params, ni: int, nj: int, bq: int, bkv: int):
    """Host-side cell list, kv-major (for dKV): every kv block gets at least
    one cell so its output store always fires."""
    import numpy as np

    offset = params.kv_len - params.q_len
    cj, ci = [], []
    for j in range(nj):
        i0 = min(max((j * bkv - offset) // bq, 0), ni - 1)
        i1 = ni - 1
        if params.window is not None:
            i1 = min(
                max(((j + 1) * bkv - 1 - offset + params.window - 1) // bq, i0),
                ni - 1,
            )
        for i in range(i0, i1 + 1):
            cj.append(j)
            ci.append(i)
    return np.asarray(cj, np.int32), np.asarray(ci, np.int32)


def _bwd_dkv(params: _Params, q, k, v, do, lse, di, qseg=None, kvseg=None):
    # q arrives raw; the exp2-domain scaling happens on the tile inside
    # _recompute_p (no host-side pass over q, no dk unscale).
    bh, group, lq, d = q.shape
    lk = k.shape[1]
    bq, bkv = params.blocks.bwd_dkv()
    ni, nj = lq // bq, lk // bkv
    kv_padded = lk != params.kv_len
    # ni == 1: each kv block sees exactly one q cell — dk/dv store directly,
    # no scratch accumulators (see _fwd_kernel single_pass).
    single_pass = ni == 1
    seg_in = (qseg, kvseg) if params.segmented else ()
    out_shape = [
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    scratch = (
        []
        if single_pass
        else [
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ]
    )
    if params.causal:
        cj, ci = _causal_cells_kvmajor(params, ni, nj, bq, bkv)
        ncells = len(cj)
        kernel = functools.partial(
            _dkv_kernel, params=params, ni=ni, nj=nj, kv_padded=kv_padded,
            ncells=ncells, single_pass=single_pass,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh, ncells),
                in_specs=[
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, jt, it: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec((1, bkv, d), lambda b, c, jt, it: (b, jt[c], 0)),
                    pl.BlockSpec((1, bkv, d), lambda b, c, jt, it: (b, jt[c], 0)),
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, jt, it: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec((1, group, bq), lambda b, c, jt, it: (b, 0, it[c])),
                    pl.BlockSpec((1, group, bq), lambda b, c, jt, it: (b, 0, it[c])),
                    *(
                        [
                            pl.BlockSpec((1, 1, bq), lambda b, c, jt, it: (b, 0, it[c])),
                            pl.BlockSpec((1, 1, bkv), lambda b, c, jt, it: (b, 0, jt[c])),
                        ]
                        if params.segmented
                        else []
                    ),
                ],
                out_specs=[
                    pl.BlockSpec((1, bkv, d), lambda b, c, jt, it: (b, jt[c], 0)),
                    pl.BlockSpec((1, bkv, d), lambda b, c, jt, it: (b, jt[c], 0)),
                ],
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=use_interpret(),
        )(jnp.asarray(cj), jnp.asarray(ci), q, k, v, do, lse, di, *seg_in)

    kernel = functools.partial(
        _dkv_kernel, params=params, ni=ni, nj=nj, kv_padded=kv_padded,
        single_pass=single_pass,
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, nj, ni),
        in_specs=[
            pl.BlockSpec((1, group, bq, d), lambda b, j, i: (b, 0, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, group, bq, d), lambda b, j, i: (b, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, group, bq), lambda b, j, i: (b, 0, i)),
            *(
                [
                    pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
                    pl.BlockSpec((1, 1, bkv), lambda b, j, i: (b, 0, j)),
                ]
                if params.segmented
                else []
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, bkv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(q, k, v, do, lse, di, *seg_in)


def _bwd_dq(params: _Params, q, k, v, do, lse, di, qseg=None, kvseg=None):
    # q arrives raw; the exp2-domain scaling happens on the tile inside
    # _recompute_p (dq = ds @ k is unaffected either way).
    bh, group, lq, d = q.shape
    lk = k.shape[1]
    bq, bkv = params.blocks.bwd_dq()
    ni, nj = lq // bq, lk // bkv
    kv_padded = lk != params.kv_len
    # nj == 1: each q block sees one kv cell — dq stores directly (see
    # _fwd_kernel single_pass).
    single_pass = nj == 1
    seg_in = (qseg, kvseg) if params.segmented else ()
    if params.causal:
        ci, cj = _causal_cells_qmajor(params, ni, nj, bq, bkv)
        ncells = len(ci)
        kernel = functools.partial(
            _dq_kernel, params=params, nj=nj, kv_padded=kv_padded,
            ncells=ncells, single_pass=single_pass,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh, ncells),
                in_specs=[
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                    pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
                    ),
                    pl.BlockSpec((1, group, bq), lambda b, c, it, jt: (b, 0, it[c])),
                    pl.BlockSpec((1, group, bq), lambda b, c, it, jt: (b, 0, it[c])),
                    *(
                        [
                            pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
                            pl.BlockSpec((1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
                        ]
                        if params.segmented
                        else []
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, group, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
                    ),
                ],
                scratch_shapes=(
                    [] if single_pass
                    else [pltpu.VMEM((group * bq, d), jnp.float32)]
                ),
            ),
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=use_interpret(),
        )(jnp.asarray(ci), jnp.asarray(cj), q, k, v, do, lse, di, *seg_in)[0]

    kernel = functools.partial(
        _dq_kernel, params=params, nj=nj, kv_padded=kv_padded,
        single_pass=single_pass,
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, ni, nj),
        in_specs=[
            pl.BlockSpec((1, group, bq, d), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, group, bq, d), lambda b, i, j: (b, 0, i, 0)),
            pl.BlockSpec((1, group, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, group, bq), lambda b, i, j: (b, 0, i)),
            *(
                [
                    pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
                    pl.BlockSpec((1, 1, bkv), lambda b, i, j: (b, 0, j)),
                ]
                if params.segmented
                else []
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, group, bq, d), lambda b, i, j: (b, 0, i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        scratch_shapes=(
            [] if single_pass else [pltpu.VMEM((group * bq, d), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(q, k, v, do, lse, di, *seg_in)[0]


# ---------------------------------------------------------------------------
# custom_vjp glue (PopART grad-op registration analog, …cpp:519-558)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(params: _Params, q, k, v):
    o, _ = _fwd(params, q, k, v, need_lse=False)
    return o


def _flash_fwd_rule(params: _Params, q, k, v):
    o, lse = _fwd(params, q, k, v)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(params: _Params, res, do):
    q, k, v, o, lse = res
    # di = rowsum(out * grad)  (cf. …cpp:374-377)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    dk, dv = _bwd_dkv(params, q, k, v, do, lse, di)
    dq = _bwd_dq(params, q, k, v, do, lse, di)
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_lse(params: _Params, q, k, v):
    return _fwd(params, q, k, v)


def _flash_lse_fwd_rule(params: _Params, q, k, v):
    o, lse = _fwd(params, q, k, v)
    return (o, lse), (q, k, v, o, lse)


def _flash_lse_bwd_rule(params: _Params, res, cts):
    """VJP with a logsumexp cotangent.

    Since lse = logsumexp(s) row-wise, d lse/d s = softmax(s) = p, so the
    score cotangent gains `dlse * p` — which folds into the existing kernels
    as di -> di - dlse (ds = p * (dp - di + dlse)).  dv is untouched.  This
    one-line shift is what makes ring attention trainable: the cross-shard
    softmax merge differentiates through lse.
    """
    do, dlse = cts
    q, k, v, o, lse = res
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = di - dlse.astype(jnp.float32)
    dk, dv = _bwd_dkv(params, q, k, v, do, lse, di)
    dq = _bwd_dq(params, q, k, v, do, lse, di)
    return dq, dk, dv


_flash_lse.defvjp(_flash_lse_fwd_rule, _flash_lse_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_seg(params: _Params, q, k, v, qseg, kvseg):
    o, _ = _fwd(params, q, k, v, qseg, kvseg, need_lse=False)
    return o


def _flash_seg_fwd_rule(params: _Params, q, k, v, qseg, kvseg):
    o, lse = _fwd(params, q, k, v, qseg, kvseg)
    return o, (q, k, v, o, lse, qseg, kvseg)


def _flash_seg_bwd_rule(params: _Params, res, do):
    import numpy as np

    q, k, v, o, lse, qseg, kvseg = res
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    dk, dv = _bwd_dkv(params, q, k, v, do, lse, di, qseg, kvseg)
    dq = _bwd_dq(params, q, k, v, do, lse, di, qseg, kvseg)
    # integer segment ids take float0 cotangents
    zq = np.zeros(qseg.shape, jax.dtypes.float0)
    zkv = np.zeros(kvseg.shape, jax.dtypes.float0)
    return dq, dk, dv, zq, zkv


_flash_seg.defvjp(_flash_seg_fwd_rule, _flash_seg_bwd_rule)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    segment_ids=None,
    block_sizes: BlockSizes | None = None,
    num_chunks_q: int | None = None,
    num_chunks_kv: int | None = None,
    ones_l: bool = False,
) -> jax.Array:
    """Memory-efficient (flash) attention on TPU.

    ones_l (experimental): compute the softmax row sum on the MXU via a
    ones column appended to V (see _Params.ones_l) instead of a VPU
    reduction.  Self-consistent numerics within the dtype parity tier.

    Args:
      q: [batch, num_q_heads, q_len, head_dim].
      k, v: [batch, num_kv_heads, kv_len, head_dim] with
        num_q_heads % num_kv_heads == 0 (GQA/MQA supported natively).
      causal: apply a causal mask (queries aligned to the end of kv).
      sm_scale: softmax scale; default 1/sqrt(head_dim).  Pass 1.0 for
        reference parity with flash_attention_qkv_packed, which does NOT
        scale (caller's responsibility — _impl/flash_attention_qkv_packed.py:55).
      window: sliding-window (local) attention — attend only to the last
        `window` positions including self (Mistral-style).  Requires causal.
        Out-of-window blocks are skipped entirely, compute AND DMA.
      segment_ids: packed-sequence masking — an int array [batch, seq]
        (self-attention) or a (q_ids [batch, q_len], kv_ids [batch, kv_len])
        pair; tokens attend only within their segment (multi-document
        packing, no cross-document attention).
      block_sizes: explicit tiling; overrides num_chunks_*.
      num_chunks_q / num_chunks_kv: reference-style chunk counts mapped to
        block sizes (cpp/flash_attention_qkv_packed.cpp:560-607 semantics).

    Returns: [batch, num_q_heads, q_len, head_dim], differentiable.

    Dtype contract: fp32 and bf16 are native.  float16 — which the
    reference op registers (cpp/flash_attention_qkv_packed.cpp:609-616) —
    is accepted for drop-in compatibility but COMPUTED IN BFLOAT16 (the
    TPU MXU has no fp16 mode; bf16 is the hardware's half precision) and
    cast back to float16 on output, so expect bf16-tier accuracy (~1e-2
    max abs err), not fp16-tier.
    """
    if q.dtype == jnp.float16:
        out = flash_attention(
            q.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            causal=causal, sm_scale=sm_scale, window=window,
            segment_ids=segment_ids, block_sizes=block_sizes,
            num_chunks_q=num_chunks_q, num_chunks_kv=num_chunks_kv,
            ones_l=ones_l,
        )
        return out.astype(jnp.float16)
    b, hq, lq, d = q.shape
    bk, hkv, lk, dk_ = k.shape
    if v.shape != k.shape:
        raise ValueError(f"k and v shapes must match: {k.shape} vs {v.shape}")
    if bk != b or dk_ != d:
        raise ValueError(f"q/k shape mismatch: {q.shape} vs {k.shape}")
    if hq % hkv != 0:
        raise ValueError(
            f"num_q_heads ({hq}) must be divisible by num_kv_heads ({hkv})"
        )
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    if window is not None:
        if not causal:
            raise ValueError("window (sliding-window) requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if window >= lk:
            window = None  # full causal — no window constraint binds

    if segment_ids is not None:
        if isinstance(segment_ids, (tuple, list)):
            q_ids, kv_ids = segment_ids
        else:
            q_ids = kv_ids = segment_ids
        q_ids = jnp.asarray(q_ids, jnp.int32)
        kv_ids = jnp.asarray(kv_ids, jnp.int32)
        if q_ids.shape != (b, lq) or kv_ids.shape != (b, lk):
            raise ValueError(
                f"segment_ids shapes {q_ids.shape}/{kv_ids.shape} must be "
                f"({b}, {lq}) / ({b}, {lk})"
            )

    # Tiny/short shapes: dense path (the reference's CPU-fallback role,
    # _impl/flash_attention_qkv_packed.py:47-53).
    if lq < MIN_BLOCK or lk < MIN_BLOCK:
        k_r = jnp.repeat(k, group, axis=1) if group > 1 else k
        v_r = jnp.repeat(v, group, axis=1) if group > 1 else v
        segs = (q_ids, kv_ids) if segment_ids is not None else None
        return vanilla_attention(
            q, k_r, v_r, causal=causal, sm_scale=sm_scale, window=window,
            segment_ids=segs,
        )

    if block_sizes is None:
        if num_chunks_q is not None or num_chunks_kv is not None:
            block_sizes = blocks_from_chunks(
                lq, lk, num_chunks_q or 1, num_chunks_kv or 1
            )
        else:
            # Measurement replaces the guess (autotune.py): when this
            # exact configuration has been autotuned on this device kind,
            # use the measured winner; otherwise the hand-tuned defaults.
            # Window/segment variants keep the defaults — the tuner's
            # cache entries were measured on the plain causal kernel.
            if window is None and segment_ids is None:
                from .autotune import tuned_blocks

                block_sizes = tuned_blocks(
                    q.shape, lk, q.dtype, causal=causal, num_kv_heads=hkv
                )
            if block_sizes is None:
                block_sizes = default_blocks(lq, lk, d, group)
    # Clamp blocks to (128-aligned) sequence lengths.
    block_sizes = dataclasses.replace(
        block_sizes,
        block_q=min(block_sizes.block_q, _round_up(lq, MIN_BLOCK)),
        block_kv=min(block_sizes.block_kv, _round_up(lk, MIN_BLOCK)),
    )
    # Pad to the forward block multiples (differentiable; grads of pads are
    # slices), then pin every backward block to a divisor of the padded
    # lengths so both the forward and backward grids cover all rows exactly
    # (floor division in the grids would otherwise drop tails / leave o+lse
    # rows unwritten and feed NaN lse into the backward).
    lqp = _round_up(lq, block_sizes.block_q)
    lkp = _round_up(lk, block_sizes.block_kv)
    block_sizes = resolve_bwd_blocks(block_sizes, lqp, lkp)

    params = _Params(
        sm_scale=float(sm_scale),
        causal=causal,
        q_len=lq,
        kv_len=lk,
        blocks=block_sizes,
        window=window,
        segmented=segment_ids is not None,
        ones_l=ones_l,
    )
    # Blocks cover the full head dim, so any array-equal lane width is
    # legal on TPU; padding to 128 would double HBM traffic at D=64.
    dp = _round_up(d, 8)
    if lqp != lq or dp != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    if lkp != lk or dp != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))

    q4 = q.reshape(b * hkv, group, lqp, dp)
    k3 = k.reshape(b * hkv, lkp, dp)
    v3 = v.reshape(b * hkv, lkp, dp)
    if segment_ids is not None:
        # Pad q ids with -1 and kv ids with -2: padded positions never match
        # anything, so padding stays inert under the segment mask.
        q_ids = jnp.pad(q_ids, ((0, 0), (0, lqp - lq)), constant_values=-1)
        kv_ids = jnp.pad(kv_ids, ((0, 0), (0, lkp - lk)), constant_values=-2)
        qseg = jnp.broadcast_to(q_ids[:, None, :], (b, hkv, lqp)).reshape(
            b * hkv, 1, lqp
        )
        kvseg = jnp.broadcast_to(kv_ids[:, None, :], (b, hkv, lkp)).reshape(
            b * hkv, 1, lkp
        )
        out = _flash_seg(params, q4, k3, v3, qseg, kvseg)
    else:
        out = _flash(params, q4, k3, v3)
    out = out.reshape(b, hq, lqp, dp)
    if lqp != lq or dp != d:
        out = out[:, :, :lq, :d]
    return out


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Flash attention returning (out, logsumexp) — DIFFERENTIABLE in both.

    The analog of ``flashAttentionQKVPackedWithStash``
    (cpp/flash_attention_qkv_packed.cpp:175-334); used by ring attention to
    combine partial results across sequence shards.  The lse cotangent folds
    into the backward kernels as a di shift, so training can differentiate
    through cross-shard softmax merges.
    """
    b, hq, lq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    if block_sizes is None:
        block_sizes = default_blocks(lq, k.shape[2], d, group)
    lk = k.shape[2]
    block_sizes = dataclasses.replace(
        block_sizes,
        block_q=min(block_sizes.block_q, _round_up(lq, MIN_BLOCK)),
        block_kv=min(block_sizes.block_kv, _round_up(lk, MIN_BLOCK)),
    )
    lqp = _round_up(lq, block_sizes.block_q)
    lkp = _round_up(lk, block_sizes.block_kv)
    # Backward blocks must divide the padded lengths (see flash_attention):
    # this entry point feeds ring-attention training, where a silent tail
    # drop corrupts dk/dv across every shard.
    block_sizes = resolve_bwd_blocks(block_sizes, lqp, lkp)
    params = _Params(
        sm_scale=float(sm_scale),
        causal=causal,
        q_len=lq,
        kv_len=lk,
        blocks=block_sizes,
    )
    # Blocks cover the full head dim, so any array-equal lane width is
    # legal on TPU; padding to 128 would double HBM traffic at D=64.
    dp = _round_up(d, 8)
    if lqp != lq or dp != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    if lkp != lk or dp != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    q4 = q.reshape(b * hkv, group, lqp, dp)
    o, lse = _flash_lse(
        params, q4, k.reshape(b * hkv, lkp, dp), v.reshape(b * hkv, lkp, dp)
    )
    o = o.reshape(b, hq, lqp, dp)[:, :, :lq, :d]
    lse = lse.reshape(b, hq, lqp)[:, :, :lq]
    return o, lse
