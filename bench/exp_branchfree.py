"""CONCLUSION (measured v5e): V0 67.9 / V1 66.8 / V2 67.3 / V3 68.9 TF/s —
branches are NOT the bottleneck (within noise).

Throwaway experiment: does removing @pl.when branches from the kernel
body let Mosaic software-pipeline across causal row boundaries?

Evidence so far: per-VISITED-cell rate at identical tile shapes climbs from
~85 TF/s (L=4k, 2.5 cells/row) through 127 (16k) to ~155 = the matmul
ceiling (64k, ~17 cells/row).  So Mosaic overlaps the VPU softmax with the
MXU matmuls ACROSS grid cells — but something at the per-row boundaries
(init/store @pl.when branches, mask dispatch) restarts the pipeline, and
at L=4096 most cells sit next to a boundary (~7us/row measured, constant
across L at fixed row count).

Variants, (4,12,4096,128) causal, 1024x1024 compact grid, group=1:

  V0: repo kernel (baseline ~68)
  V1: store every cell — normalize+write o_ref unconditionally; the output
      DMA still fires once per row (pallas writes on block-index change),
      so this only costs VPU, and kills the store_cond branch.
  V2: V1 + branch-free init — carry loads go through a select on
      "first cell of row" instead of a zeroing branch.
  V3: V2 + branch-free mask — mask arithmetic applied on EVERY cell
      (below-diagonal cells add 0.0 everywhere); no pl.when left.

Run: python bench/exp_branchfree.py
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


def _kernel(i_tab, j_tab, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
            *, ncells, bq, bkv, variant):
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    first = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    last = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i)

    if variant < 2:
        @pl.when(first)
        def _():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]
    d = q.shape[-1]

    def body(masked: bool):
        s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            rp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            cp = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = s + jnp.where(cp <= rp, 0.0, MASK)
        if variant >= 2:
            m_prev = jnp.where(first, -jnp.inf, m_scr[...])
            l_prev = jnp.where(first, 0.0, l_scr[...])
        else:
            m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        l_scr[...] = l_next
        m_scr[...] = m_next
        pv = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                         preferred_element_type=jnp.float32)
        if variant >= 2:
            acc = jnp.where(first, 0.0, acc_scr[...]) * alpha[:, 0:1] + pv
        else:
            acc = acc_scr[...] * alpha[:, 0:1] + pv
        acc_scr[...] = acc
        if variant >= 1:
            l0 = l_next[:, 0:1]
            o_ref[...] = (acc / jnp.where(l0 == 0, 1.0, l0))[None].astype(
                o_ref.dtype)

    if variant >= 3:
        body(True)
    else:
        diag = (j + 1) * bkv - 1 > i * bq

        @pl.when(diag)
        def _():
            body(True)

        @pl.when(jnp.logical_not(diag))
        def _():
            body(False)

    if variant == 0:
        @pl.when(last)
        def _():
            l = l_scr[:, 0:1]
            o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l))[
                None].astype(o_ref.dtype)


def run(q, k, v, sm_scale, variant, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, ncells=ncells, bq=bq, bkv=bkv,
                          variant=variant),
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
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
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
    q = q4.reshape(b * h, l, d)
    k = k4.reshape(b * h, l, d)
    v = v4.reshape(b * h, l, d)
    flops = 4 * b * h * l * l * d * 0.5

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
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)

    time_fn("repo       ", lambda a, b_, c: flash_attention(
        a.reshape(b, h, l, d), k4, v4).reshape(b * h, l, d), q, k, v)
    for var in (0, 1, 2, 3):
        time_fn(f"V{var}         ",
                functools.partial(run, sm_scale=sm, variant=var), q, k, v)

    o_ref = flash_attention(q4, k4, v4).reshape(b * h, l, d)
    for var in (1, 3):
        o2 = run(q, k, v, sm, var)
        err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        print(f"V{var} vs repo max err: {err:.2e}")


if __name__ == "__main__":
    main()
