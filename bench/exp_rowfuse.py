"""CONCLUSION (measured v5e): rowfuse 62.2 vs 67.9 grid-based — LOSES.
In-body fori_loop serializes against the cross-cell pipeline.  mm-only at
16k runs 3.67 us/cell ~= the 3.42 matmul floor: the grid is fine in
steady state.

Throwaway experiment: fuse the causal kv loop INSIDE the kernel body.

exp_rowpipe.py isolated the L=4k bottleneck: ~6us per q-row of grid/DMA
pipeline overhead that even a matmul-only body pays (5.77us/cell vs 3.42us
of matmul; softmax itself adds only ~0.5us).  At 4k a KV row is 2 MB — it
FITS in VMEM.  So: one grid step per q-row, the whole (padded) KV row as a
revisited block (DMA'd once per bh), and a lax.fori_loop over kv tiles
with in-VMEM slicing and register-carried (m, l, acc).  Per-cell grid
machinery disappears; the only per-row costs left are one q DMA, one o
DMA, and the loop itself.

  A: mm-only @ 16k (steady-state check: does the grid hit ~157 w/o rows?)
  B: rowfuse softmax kernel @ 4k headline shape (exact vs repo)

Run: python bench/exp_rowfuse.py
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


def _kernel_rowfuse(q_ref, k_ref, v_ref, o_ref, *, bq, bkv, nj_max):
    i = pl.program_id(1)
    q = q_ref[0]  # (bq, d) pre-scaled
    d = q.shape[-1]
    rp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq

    def step(j, carry):
        m_prev, l_prev, acc = carry
        k_t = k_ref[0, pl.ds(j * bkv, bkv), :]
        s = jax.lax.dot_general(q, k_t, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        cp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
        s = s + jnp.where(cp <= rp, 0.0, MASK)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        v_t = v_ref[0, pl.ds(j * bkv, bkv), :]
        pv = jax.lax.dot(p.astype(v_t.dtype), v_t,
                         preferred_element_type=jnp.float32)
        return m_next, l_next, acc * alpha + pv

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    njs = (i + 1) * bq // bkv + (1 if (bq % bkv) else 0)
    _, l, acc = jax.lax.fori_loop(0, njs, step, (m0, l0, a0))
    o_ref[...] = (acc / jnp.where(l == 0, 1.0, l))[None].astype(o_ref.dtype)


def run_rowfuse(q, k, v, sm_scale, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni = l // bq
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel_rowfuse, bq=bq, bkv=bkv, nj_max=l // bkv),
        grid=(bh, ni),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(q, k, v)


# --- mm-only at 16k: steady-state grid check (from exp_rowpipe) ---

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
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    acc = jnp.where(first, 0.0, acc_scr[...]) + pv
    acc_scr[...] = acc
    o_ref[...] = acc[None].astype(o_ref.dtype)


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


def main():
    from flash_attention_tpu.kernels import flash_attention

    def time_fn(name, fn, a, flops, ncells):
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

    # A: steady-state mm-only at 16k
    b, h, l, d = 1, 12, 16384, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.06
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    ncells = 12 * sum(min(i + 1, 16) for i in range(16))
    time_fn("mm-only 16k", run_mm, (q, k, v),
            4 * b * h * l * l * d * 0.5, ncells)

    # B: rowfuse at the headline shape
    b, h, l, d = 4, 12, 4096, 128
    sm = float(d) ** -0.5
    q4 = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k4 = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v4 = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    q = q4.reshape(b * h, l, d)
    k = k4.reshape(b * h, l, d)
    v = v4.reshape(b * h, l, d)
    flops = 4 * b * h * l * l * d * 0.5
    time_fn("rowfuse 4k ", functools.partial(run_rowfuse, sm_scale=sm),
            (q, k, v), flops, 48 * 4)

    o_ref = flash_attention(q4, k4, v4).reshape(b * h, l, d)
    o2 = run_rowfuse(q, k, v, sm)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"rowfuse vs repo max err: {err:.2e}")


if __name__ == "__main__":
    main()
