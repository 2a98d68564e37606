"""CONCLUSION (measured v5e): mm-only 5.77 us/cell at 4k vs 3.42 matmul
floor — the overhead is NOT the softmax (full kernel only +0.5 us) and
not the scratch (V4 2x-scratch 6.47).

Throwaway experiment: what exactly costs ~7us per causal q-row at L=4k?

exp_branchfree.py ruled out the @pl.when init/store/mask branches (V3 =
V0).  At 64k the same body runs at pure-matmul per-cell time (6.91 vs
6.84us) — everything hides behind the MXU; at 4k, 2.8us/cell does not.
Remaining suspects at the row boundary:

  M : matmul-only body — s = q@k^T; acc += s(bf16)@v; store.  Same grid,
      same DMA, no softmax.  If M also shows ~6us/cell, the overhead is in
      the grid/DMA pipeline, not VPU serialization at boundaries.
  V4: branch-free body + DOUBLE-BUFFERED scratch (row-parity indexed) —
      removes the cross-row WAR hazard on m/l/acc that could stall the
      across-cell software pipeline at every row change.
  W : V3 with wider-but-short q (bq=512): more rows, shorter rows — if
      overhead is per-row it gets worse in proportion.

Run: python bench/exp_rowpipe.py
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


def _kernel_mm(i_tab, j_tab, q_ref, k_ref, v_ref, o_ref, acc_scr,
               *, ncells, bq, bkv):
    c = pl.program_id(1)
    i = i_tab[c]
    first = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    acc = jnp.where(first, 0.0, acc_scr[...]) + pv
    acc_scr[...] = acc
    o_ref[...] = acc[None].astype(o_ref.dtype)


def _kernel_v4(i_tab, j_tab, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc_scr, *, ncells, bq, bkv):
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    par = i % 2
    first = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    rp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
    cp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
    s = s + jnp.where(cp <= rp, 0.0, MASK)
    m_prev = jnp.where(first, -jnp.inf, m_scr[par])
    l_prev = jnp.where(first, 0.0, l_scr[par])
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, 0:1])
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    l_scr[par] = l_next
    m_scr[par] = m_next
    pv = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    acc = jnp.where(first, 0.0, acc_scr[par]) * alpha[:, 0:1] + pv
    acc_scr[par] = acc
    l0 = l_next[:, 0:1]
    o_ref[...] = (acc / jnp.where(l0 == 0, 1.0, l0))[None].astype(o_ref.dtype)


def run_mm(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    return pl.pallas_call(
        functools.partial(_kernel_mm, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), q, k, v)


def run_v4(q, k, v, sm_scale, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel_v4, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, bq, 128), jnp.float32),
                pltpu.VMEM((2, bq, 128), jnp.float32),
                pltpu.VMEM((2, bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), q, k, v)


def main():
    from flash_attention_tpu.kernels import flash_attention

    b, h, l, d = 4, 12, 4096, 128
    sm = float(d) ** -0.5
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q4 = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k4 = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v4 = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    q = q4.reshape(b * h, l, d) * 0.06
    k = k4.reshape(b * h, l, d)
    v = v4.reshape(b * h, l, d)
    flops = 4 * b * h * l * l * d * 0.5
    ncells = 48 * 10

    def time_fn(name, fn, *a):
        depth = 8

        @jax.jit
        def chained(q, k, v):
            o = q
            for _ in range(depth):
                o = fn(o, k, v)
            return jnp.sum(o.astype(jnp.float32))

        s = chained(*a)
        float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(*a)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    time_fn("mm-only ", run_mm, q, k, v)
    time_fn("V4 2xscr", functools.partial(run_v4, sm_scale=sm), q, k, v)

    o_ref = flash_attention(q4 * 0.06, k4, v4).reshape(b * h, l, d)
    o2 = run_v4(q, k, v, sm)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"V4 vs repo max err: {err:.2e}")


if __name__ == "__main__":
    main()
