"""Quantized-KV flash attention: INT8/FP8 KV dequantized inside the kernel.

North-star extension (BASELINE.json: "FP8/INT8 quantized KV-cache
dequantized inside the attention tile loop, never materializing the attention
matrix in HBM").  KV payloads stream from HBM at 1 byte/elem; the per-token
scales fold into VPU ops the kernel already does:

  s = q @ (k_int * ks)^T  ==  (q @ k_int^T) * ks[col]     (scale the scores)
  o += p @ (v_int * vs)   ==  (p * vs[col]) @ v_int       (scale the weights)

so dequantization costs two (rows, bkv) multiplies that fuse with masking and
the exp — no extra (bkv, d) traffic at all.  Forward-only (inference path).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import use_interpret
from ..kernels.block_sizes import MIN_BLOCK, BlockSizes, default_blocks
from ..kernels.flash_attention import (
    _LOG2E,
    _causal_cells_qmajor,
    _compact_dispatch,
    _dispatch_block,
    _mask_for_block,
    _Params,
    _round_up,
    _seg_mask,
)
from ..kernels.vanilla import DEFAULT_MASK_VALUE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedKV:
    """Per-token symmetric-quantized K/V: payload [B,H,L,D], scales [B,H,L]."""

    k: jax.Array
    k_scale: jax.Array
    v: jax.Array
    v_scale: jax.Array

    def tree_flatten(self):
        return (self.k, self.k_scale, self.v, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def kv_len(self) -> int:
        return self.k.shape[2]


def quantize_tokens(x: jax.Array, dtype=jnp.int8):
    """Per-token symmetric quantization: x [..., d] -> (payload, scales[...]).

    The single source of truth for INT8/FP8 token quantization — the KV
    cache (inference/kv_cache.py) and QuantizedKV both use it, so cache
    contents and the quant-kernel parity tests can never drift apart.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    if dtype == jnp.int8:
        scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        payload = jnp.clip(
            jnp.round(x32 / scale[..., None]), -127, 127
        ).astype(jnp.int8)
    else:  # fp8
        fmax = float(jnp.finfo(dtype).max)
        scale = jnp.where(amax == 0, 1.0, amax / fmax)
        payload = (x32 / scale[..., None]).astype(dtype)
    return payload, scale


def quantize_kv(
    k: jax.Array, v: jax.Array, *, dtype=jnp.int8
) -> QuantizedKV:
    """Per-token symmetric quantization of K and V ([B, H, L, D])."""
    kq, ks = quantize_tokens(k, dtype)
    vq, vs = quantize_tokens(v, dtype)
    return QuantizedKV(kq, ks, vq, vs)


def dequantize_kv(qkv: QuantizedKV, dtype=jnp.bfloat16):
    k = (qkv.k.astype(jnp.float32) * qkv.k_scale[..., None]).astype(dtype)
    v = (qkv.v.astype(jnp.float32) * qkv.v_scale[..., None]).astype(dtype)
    return k, v


def _fwd_quant_kernel(
    *refs,
    params: _Params,
    nj: int,
    kv_padded: bool,
    ncells: int | None = None,
):
    """Quantized-KV forward kernel — mirrors _fwd_kernel's two modes.

    Rectangular mode (ncells=None): grid (BH, ni, nj), refs are
    (q, k, ks, v, vs [, qseg, kvseg], o, m, l, acc).  Compact mode
    (causal): grid (BH, ncells) over the admitted cells only, with leading
    (i_tab, j_tab) scalar-prefetch refs — skipped cells cost neither grid
    steps nor DMA, same as the main kernel.
    """
    nseg = 2 if params.segmented else 0
    if ncells is None:
        q_ref, k_ref, ks_ref, v_ref, vs_ref = refs[:5]
        qseg_ref, kvseg_ref = refs[5:7] if nseg else (None, None)
        o_ref, m_scr, l_scr, acc_scr = refs[5 + nseg:]
        i, j = pl.program_id(1), pl.program_id(2)
        init_cond = j == 0
        store_cond = j == nj - 1
    else:
        i_tab, j_tab, q_ref, k_ref, ks_ref, v_ref, vs_ref = refs[:7]
        qseg_ref, kvseg_ref = refs[7:9] if nseg else (None, None)
        o_ref, m_scr, l_scr, acc_scr = refs[7 + nseg:]
        c = pl.program_id(1)
        i, j = i_tab[c], j_tab[c]
        init_cond = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
        store_cond = jnp.logical_or(
            c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
        )
    bq, bkv = params.blocks.block_q, params.blocks.block_kv
    group, d = q_ref.shape[1], q_ref.shape[3]
    rows = group * bq

    @pl.when(init_cond)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(causal_mask: bool, kv_mask: bool):
        q = q_ref[0].reshape(rows, d)
        # Dequantize the K TILE (a (bkv, d) multiply), not the scores: at
        # rows >= 8*d a (rows, bkv) score multiply is 8x the elements of the
        # operand multiply.  Measured on v5e at the 32k flagship: 133.9 vs
        # 120.5 TF/s (+11%, bench/exp_quant_dequant.py).  q arrives
        # pre-scaled by sm_scale*log2e host-side, so from here the score
        # path is identical to the bf16 kernel's.
        k = k_ref[0].astype(q.dtype) * ks_ref[0].reshape(bkv, 1).astype(
            q.dtype
        )
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
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

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next
        # dequantize the V tile likewise ((bkv, d) multiply, not (rows, bkv))
        v = v_ref[0].astype(q.dtype) * vs_ref[0].reshape(bkv, 1).astype(
            q.dtype
        )
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(q.dtype), v, preferred_element_type=jnp.float32
        )

    if ncells is None:
        _dispatch_block(params, i, j, bq, bkv, nj, kv_padded, body)
    else:
        _compact_dispatch(params, i, j, bq, bkv, nj, kv_padded, body)

    @pl.when(store_cond)
    def _store():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (
            (acc_scr[...] / l_safe).reshape(1, group, bq, d).astype(o_ref.dtype)
        )


def flash_attention_kv_quant(
    q: jax.Array,
    kv: QuantizedKV,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    segment_ids=None,
    block_sizes: BlockSizes | None = None,
) -> jax.Array:
    """Flash attention over a quantized KV cache.

    q: [B, Hq, Lq, D] bf16/f32; kv: QuantizedKV with [B, Hkv, Lkv, D]
    int8/fp8 payloads.  Forward-only.  Supports the main kernel's feature
    set: GQA, sliding window, packed-sequence segment ids, and the compact
    causal cell grid (skipped blocks cost neither grid steps nor DMA).
    """
    b, hq, lq, d = q.shape
    _, hkv, lk, _ = kv.k.shape
    group = hq // hkv
    if sm_scale is None:
        sm_scale = float(d) ** -0.5
    if window is not None:
        if not causal:
            raise ValueError("window (sliding-window) requires causal=True")
        if window >= lk:
            window = None
    q_ids = kv_ids = None
    if segment_ids is not None:
        if isinstance(segment_ids, (tuple, list)):
            q_ids, kv_ids = segment_ids
        else:
            q_ids = kv_ids = segment_ids
        q_ids = jnp.asarray(q_ids, jnp.int32)
        kv_ids = jnp.asarray(kv_ids, jnp.int32)
    if lq < MIN_BLOCK // 8 or lk < MIN_BLOCK:
        # dense fallback for tiny shapes
        from ..kernels.vanilla import vanilla_attention

        k_d, v_d = dequantize_kv(kv, dtype=q.dtype)
        if group > 1:
            k_d = jnp.repeat(k_d, group, axis=1)
            v_d = jnp.repeat(v_d, group, axis=1)
        segs = (q_ids, kv_ids) if segment_ids is not None else None
        return vanilla_attention(
            q, k_d, v_d, causal=causal, sm_scale=sm_scale, window=window,
            segment_ids=segs,
        )

    if block_sizes is None:
        block_sizes = default_blocks(lq, lk, d, group)
    block_sizes = dataclasses.replace(
        block_sizes,
        block_q=min(block_sizes.block_q, _round_up(lq, MIN_BLOCK)),
        block_kv=min(block_sizes.block_kv, _round_up(lk, MIN_BLOCK)),
    )
    params = _Params(
        sm_scale=float(sm_scale),
        causal=causal,
        q_len=lq,
        kv_len=lk,
        blocks=block_sizes,
        window=window,
        segmented=segment_ids is not None,
    )
    bq, bkv = block_sizes.block_q, block_sizes.block_kv
    lqp, lkp = _round_up(lq, bq), _round_up(lk, bkv)
    # Blocks cover the full head dim, so any array-equal lane width is
    # legal on TPU; padding to 128 would double HBM traffic at D=64.
    dp = _round_up(d, 8)
    k_q, ks, v_q, vs = kv.k, kv.k_scale, kv.v, kv.v_scale
    if lqp != lq or dp != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    if lkp != lk or dp != d:
        k_q = jnp.pad(k_q, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
        v_q = jnp.pad(v_q, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, lkp - lk)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, lkp - lk)))

    bh = b * hkv
    # exp2-domain softmax: fold sm_scale*log2(e) into q host-side (one
    # fused elementwise op), exactly like the bf16 kernel (_fwd).
    q = (q.astype(jnp.float32) * (float(sm_scale) * _LOG2E)).astype(q.dtype)
    q4 = q.reshape(bh, group, lqp, dp)
    k3, v3 = k_q.reshape(bh, lkp, dp), v_q.reshape(bh, lkp, dp)
    # scales ride as [bh, 1, L] so the block's trailing dims are (1, bkv) —
    # TPU requires last-two block dims (8k, 128k) or equal-to-array.
    ks2 = ks.reshape(bh, 1, lkp).astype(jnp.float32)
    vs2 = vs.reshape(bh, 1, lkp).astype(jnp.float32)
    ni, nj = lqp // bq, lkp // bkv
    kv_padded = lkp != lk

    seg_in = ()
    if segment_ids is not None:
        q_ids = jnp.pad(q_ids, ((0, 0), (0, lqp - lq)), constant_values=-1)
        kv_ids = jnp.pad(kv_ids, ((0, 0), (0, lkp - lk)), constant_values=-2)
        qseg = jnp.broadcast_to(q_ids[:, None, :], (b, hkv, lqp)).reshape(
            bh, 1, lqp
        )
        kvseg = jnp.broadcast_to(kv_ids[:, None, :], (b, hkv, lkp)).reshape(
            bh, 1, lkp
        )
        seg_in = (qseg, kvseg)

    scratch = [
        pltpu.VMEM((group * bq, 128), jnp.float32),
        pltpu.VMEM((group * bq, 128), jnp.float32),
        pltpu.VMEM((group * bq, dp), jnp.float32),
    ]
    out_shape = jax.ShapeDtypeStruct((bh, group, lqp, dp), q.dtype)
    if params.causal:
        # Compact grid: visit exactly the causal/window cells.
        ci, cj = _causal_cells_qmajor(params, ni, nj, bq, bkv)
        ncells = len(ci)
        kernel = functools.partial(
            _fwd_quant_kernel, params=params, nj=nj, kv_padded=kv_padded,
            ncells=ncells,
        )
        seg_specs = (
            [
                pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
                pl.BlockSpec((1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
            ]
            if params.segmented
            else []
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh, ncells),
                in_specs=[
                    pl.BlockSpec(
                        (1, group, bq, dp),
                        lambda b, c, it, jt: (b, 0, it[c], 0),
                    ),
                    pl.BlockSpec(
                        (1, bkv, dp), lambda b, c, it, jt: (b, jt[c], 0)
                    ),
                    pl.BlockSpec(
                        (1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])
                    ),
                    pl.BlockSpec(
                        (1, bkv, dp), lambda b, c, it, jt: (b, jt[c], 0)
                    ),
                    pl.BlockSpec(
                        (1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])
                    ),
                    *seg_specs,
                ],
                out_specs=pl.BlockSpec(
                    (1, group, bq, dp), lambda b, c, it, jt: (b, 0, it[c], 0)
                ),
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=use_interpret(),
        )(jnp.asarray(ci), jnp.asarray(cj), q4, k3, ks2, v3, vs2, *seg_in)
    else:
        kernel = functools.partial(
            _fwd_quant_kernel, params=params, nj=nj, kv_padded=kv_padded
        )
        seg_specs = (
            [
                pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
                pl.BlockSpec((1, 1, bkv), lambda b, i, j: (b, 0, j)),
            ]
            if params.segmented
            else []
        )
        out = pl.pallas_call(
            kernel,
            grid=(bh, ni, nj),
            in_specs=[
                pl.BlockSpec((1, group, bq, dp), lambda b, i, j: (b, 0, i, 0)),
                pl.BlockSpec((1, bkv, dp), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, 1, bkv), lambda b, i, j: (b, 0, j)),
                pl.BlockSpec((1, bkv, dp), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, 1, bkv), lambda b, i, j: (b, 0, j)),
                *seg_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, group, bq, dp), lambda b, i, j: (b, 0, i, 0)
            ),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=use_interpret(),
        )(q4, k3, ks2, v3, vs2, *seg_in)
    out = out.reshape(b, hq, lqp, dp)
    if lqp != lq or dp != d:
        out = out[:, :, :lq, :d]
    return out
