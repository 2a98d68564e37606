"""CONCLUSION (measured v5e): WASH — 132.7 vs 133.3 TF/s shipped, with
worse accuracy (2.3e-2 vs dequant semantics from the extra q quant).
Either Mosaic does not schedule int8 dots at the 2x rate on this path,
or the win is exactly cancelled by the two (rows, bkv) scale passes the
tile-dequant design had removed.  Rejected; int8 stays KV-only.

Throwaway experiment: int8 x int8 QK^T on the MXU for the quant kernel.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate.  The int8-KV
kernel currently dequantizes the K tile to bf16 and contracts at bf16
rate; if q is ALSO per-token int8-quantized (host-side), QK^T can run as
an integer matmul and the dequant becomes two score-side scale vectors:

  s = (q_int @ k_int^T) * qs[row] * ks[col] * sm_scale * log2e

The row/col scale multiplies are the (rows, bkv) passes the tile-dequant
redesign just removed (8x rule) — but halving QK^T time may pay for
them.  Accuracy: q quantization adds ~0.4%/element score noise on top of
the KV quant — an OPT-IN mode for inference if it wins.

  A: shipped tile-dequant int8 kernel (baseline, ~134-137 TF/s)
  B: int8 QK^T + fused col/row scaling, bf16 PV (v tile-dequant)

Run: python bench/exp_int8qk.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

MASK = -0.7 * float(np.finfo(np.float32).max)
_LOG2E = 1.4426950408889634


def _cells(ni, nj, bq, bkv):
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def _kernel_int8qk(i_tab, j_tab, q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                   o_ref, m_scr, l_scr, acc_scr, *, ncells, bq, bkv):
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i)

    @pl.when(init)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(masked: bool):
        # integer QK^T: int8 x int8 -> int32 on the MXU
        s_i = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # dequant: per-row q scale x per-col k scale (exp2 domain folded
        # into the row scale host-side)
        s = (s_i.astype(jnp.float32)
             * ks_ref[0].reshape(1, bkv)) * qs_ref[0].reshape(bq, 1)
        if masked:
            rp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            cp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = s + jnp.where(cp <= rp, 0.0, MASK)
        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        v = (v_ref[0].astype(jnp.bfloat16)
             * vs_ref[0].reshape(bkv, 1).astype(jnp.bfloat16))
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)

    diag = (j + 1) * bkv - 1 > i * bq

    @pl.when(diag)
    def _():
        body(True)

    @pl.when(jnp.logical_not(diag))
    def _():
        body(False)

    @pl.when(store)
    def _():
        l = l_scr[:, 0:1]
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l))[None].astype(
            o_ref.dtype)


def run_int8qk(qi, qs, kq, ks, vq, vs, bq=1024, bkv=2048):
    bh, l, d = qi.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    return pl.pallas_call(
        functools.partial(_kernel_int8qk, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, 1, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), qi, qs, kq, ks, vq, vs)


def main():
    from flash_attention_tpu.quant import flash_attention_kv_quant, quantize_kv
    from flash_attention_tpu.quant.kv import quantize_tokens

    b, h, l, d = 1, 8, 32768, 128
    sm = float(d) ** -0.5
    ks_ = jax.random.split(jax.random.PRNGKey(2), 3)
    q4 = jax.random.normal(ks_[0], (b, h, l, d), jnp.bfloat16)
    k4 = jax.random.normal(ks_[1], (b, h, l, d), jnp.bfloat16)
    v4 = jax.random.normal(ks_[2], (b, h, l, d), jnp.bfloat16)
    kv = quantize_kv(k4, v4, dtype=jnp.int8)
    flops = 4 * b * h * l * l * d * 0.5

    qi4, qsc4 = quantize_tokens(q4, jnp.int8)
    qi = qi4.reshape(b * h, l, d)
    # fold sm_scale * log2e into the per-row q scale
    qsc = (qsc4 * (sm * _LOG2E)).reshape(b * h, 1, l).astype(jnp.float32)
    kq3 = kv.k.reshape(b * h, l, d)
    vq3 = kv.v.reshape(b * h, l, d)
    ks3 = kv.k_scale.reshape(b * h, 1, l).astype(jnp.float32)
    vs3 = kv.v_scale.reshape(b * h, 1, l).astype(jnp.float32)

    # parity vs the shipped quant kernel (adds q-quant noise)
    o_ref = flash_attention_kv_quant(q4, kv, causal=True).reshape(b * h, l, d)
    o2 = run_int8qk(qi, qsc, kq3, ks3, vq3, vs3)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"int8-QK vs shipped max err: {err:.2e}", flush=True)

    def time_fn(name, fn, *a):
        depth = 16

        @jax.jit
        def chained(q0, *rest):
            def body(q, _):
                o = fn(q, *rest)
                return (q + (o[:1, :1, :1].astype(jnp.int32) * 0).reshape(
                    1, 1, 1)).astype(q.dtype) if q.dtype == jnp.int8 else o, None
            # int8 q can't chain through o; serialize via a where guard
            s = jnp.float32(0)
            o = None
            for t in range(depth):
                o = fn(q0, *rest)
                s = s + jnp.sum(o[:1, :1, :1].astype(jnp.float32))
                q0 = jnp.where(s > 1e30, q0 * 0, q0)
            return s

        s = chained(*a)
        float(s)
        t0 = time.perf_counter()
        for _ in range(2):
            s = chained(*a)
        float(s)
        dt = (time.perf_counter() - t0) / 2 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)

    time_fn("A shipped ",
            lambda qq, kv_: flash_attention_kv_quant(
                qq.reshape(b, h, l, d), kv_, causal=True
            ).reshape(b * h, l, d), q4.reshape(b * h, l, d), kv)
    time_fn("B int8-QK ", run_int8qk, qi, qsc, kq3, ks3, vq3, vs3)


if __name__ == "__main__":
    main()
