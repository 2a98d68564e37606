"""CONCLUSION (measured v5e, depth-16 chains): A shipped 120.5 / B tiledeq
1k 115.4 / B tiledeq 2k 133.9 / C tiledeq 4k 123.3 TF/s.  Tile-dequant
+ 2048-wide KV tiles shipped (quant/kv.py): flagship 136.8 TF/s.

Throwaway experiment: where should int8-KV dequantization happen?

The shipped quant kernel folds the K scale into the scores and the V scale
into the attention weights — two (rows, bkv) fp32 multiplies per tile
("no extra (bkv, d) traffic").  But at rows = 1024, d = 128 a (rows, bkv)
multiply is 8x the elements of a (bkv, d) one: scaling the small matmul
OPERANDS instead of the big score/weight tiles should cost ~1/4 the VPU
work.  Candidates, all at the flagship shape b1 h8 L32k D128 causal int8:

  A: shipped kernel (score/weight scaling)         [baseline, ~107 TF/s r2]
  B: tile-dequant — k_bf = int8->bf16 * ks[:,None], v_bf likewise (bkv, d)
     multiplies; q arrives pre-scaled so the score path becomes identical
     to the bf16 kernel's.
  C: B with 4096-wide KV tiles, bq=512 (int8 halves the KV bytes per
     column, so wider tiles fit the same DMA budget; fewer cells = less
     per-cell overhead; scores tile 512x4096 fp32 = 8 MB).

Run: python bench/exp_quant_dequant.py
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


def _kernel_tile_dequant(i_tab, j_tab, q_ref, k_ref, ks_ref, v_ref, vs_ref,
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

    q = q_ref[0]  # pre-scaled by sm_scale * log2e host-side
    d = q.shape[-1]

    def body(masked: bool):
        # Dequantize the k tile once: (bkv, d) multiply, then the score path
        # is identical to the bf16 kernel.
        k = (k_ref[0].astype(jnp.bfloat16)
             * ks_ref[0].reshape(bkv, 1).astype(jnp.bfloat16))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
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


def run_tile_dequant(q, kq, ks, vq, vs, sm_scale, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel_tile_dequant, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
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
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), q, kq, ks, vq, vs)


def main():
    from flash_attention_tpu.quant import flash_attention_kv_quant, quantize_kv

    b, h, l, d = 1, 8, 32768, 128
    sm = float(d) ** -0.5
    ks_ = jax.random.split(jax.random.PRNGKey(2), 3)
    q4 = jax.random.normal(ks_[0], (b, h, l, d), jnp.bfloat16)
    k4 = jax.random.normal(ks_[1], (b, h, l, d), jnp.bfloat16)
    v4 = jax.random.normal(ks_[2], (b, h, l, d), jnp.bfloat16)
    kv = quantize_kv(k4, v4, dtype=jnp.int8)
    flops = 4 * b * h * l * l * d * 0.5

    q3 = q4.reshape(b * h, l, d)
    kq3 = kv.k.reshape(b * h, l, d)
    vq3 = kv.v.reshape(b * h, l, d)
    ks3 = kv.k_scale.reshape(b * h, 1, l).astype(jnp.float32)
    vs3 = kv.v_scale.reshape(b * h, 1, l).astype(jnp.float32)

    def time_fn(name, fn, *a):
        depth = 16

        @jax.jit
        def chained(*a):
            o, _ = jax.lax.scan(
                lambda o, _: (fn(o, *a[1:]), None), a[0], None, length=depth)
            return jnp.sum(o.astype(jnp.float32))

        s = chained(*a)
        float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(*a)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)

    time_fn("A shipped  ",
            lambda qq, kv_: flash_attention_kv_quant(
                qq.reshape(b, h, l, d), kv_, causal=True
            ).reshape(b * h, l, d), q3, kv)
    time_fn("B tiledeq 1k",
            functools.partial(run_tile_dequant, sm_scale=sm, bq=1024, bkv=1024),
            q3, kq3, ks3, vq3, vs3)
    time_fn("B tiledeq 2k",
            functools.partial(run_tile_dequant, sm_scale=sm, bq=1024, bkv=2048),
            q3, kq3, ks3, vq3, vs3)
    try:
        time_fn("C tiledeq 4k",
                functools.partial(
                    run_tile_dequant, sm_scale=sm, bq=512, bkv=4096),
                q3, kq3, ks3, vq3, vs3)
    except Exception as e:  # VMEM OOM likely
        print(f"C tiledeq 4k: FAILED {type(e).__name__}: {str(e)[:160]}")

    o_ref = flash_attention_kv_quant(q4, kv, causal=True).reshape(b * h, l, d)
    o2 = run_tile_dequant(q3, kq3, ks3, vq3, vs3, sm)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"tile-dequant vs shipped max err: {err:.2e}")


if __name__ == "__main__":
    main()
