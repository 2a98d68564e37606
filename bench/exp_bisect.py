"""Throwaway bisect: why is the main kernel ~7 TF/s behind exp_fwd variant B?

Structural deltas, applied to variant B one at a time (all exp2 domain,
host-folded scale, compact q-major cell grid, bq=bkv=1024, causal):
  B    : 3D refs (1, bq, d), no lse output           (69.6 TF/s prior run)
  BL   : B + lse output (1, bq) block
  B4   : B + 4D refs (1, 1, bq, d) with reshape, no lse
  B4L  : B + 4D refs + 4D lse (1, 1, bq)             (≈ main kernel structure)
  MAIN : the real flash_attention entry point
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

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = float(np.log2(np.e))
LN2 = float(np.log(2.0))


def cells(ni, nj):
    ci, cj = [], []
    for i in range(ni):
        for j in range(0, i + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def kernel(i_tab, j_tab, *refs, bq, bkv, ncells, four_d, with_lse):
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
    )

    @pl.when(init)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(masked):
        if four_d:
            q = q_ref[0].reshape(bq, -1)
        else:
            q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = s + jnp.where(col <= row, 0.0, MASK)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
        )

    @pl.when(i == j)
    def _():
        body(True)

    @pl.when(i != j)
    def _():
        body(False)

    @pl.when(store)
    def _():
        l = l_scr[:, 0:1]
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[...] = (
            (acc_scr[...] / l_safe).reshape(o_ref.shape).astype(o_ref.dtype)
        )
        if with_lse:
            lse = (m_scr[:, 0:1] + jnp.log2(l_safe)) * LN2
            lse_ref[...] = lse.reshape(lse_ref.shape)


def flash(q, k, v, bq=1024, bkv=1024, four_d=False, with_lse=False):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, l // bkv
    ci, cj = cells(ni, nj)
    ncells = len(ci)
    if four_d:
        q4 = q.reshape(bh, 1, l, d)
        q_spec = pl.BlockSpec(
            (1, 1, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
        )
        o_spec = pl.BlockSpec(
            (1, 1, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)
        )
        o_shape = jax.ShapeDtypeStruct((bh, 1, l, d), q.dtype)
        lse_spec = pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c]))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, l), jnp.float32)
    else:
        q4 = q
        q_spec = pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0))
        o_spec = pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0))
        o_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
        lse_spec = pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c]))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, l), jnp.float32)
    out_specs = [o_spec] + ([lse_spec] if with_lse else [])
    out_shape = [o_shape] + ([lse_shape] if with_lse else [])
    kern = functools.partial(
        kernel, bq=bq, bkv=bkv, ncells=ncells, four_d=four_d, with_lse=with_lse
    )
    res = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                q_spec,
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), q4, k, v)
    o = res[0]
    return o.reshape(bh, l, d) if four_d else o


def timeit(f, *args, iters=3, depth=8):
    @jax.jit
    def chained(q, k, v):
        o = q
        for _ in range(depth):
            o = f(o, k, v)
        return jnp.sum(o.astype(jnp.float32))

    s = chained(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(*args)
    float(s)
    return (time.perf_counter() - t0) / iters / depth


def main():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5

    configs = [
        ("B   (3D, no lse)", dict(four_d=False, with_lse=False)),
        ("BL  (3D, +lse)", dict(four_d=False, with_lse=True)),
        ("B4  (4D, no lse)", dict(four_d=True, with_lse=False)),
        ("B4L (4D, +lse)", dict(four_d=True, with_lse=True)),
    ]
    for name, kw in configs:
        f = functools.partial(flash, **kw)
        dt = timeit(f, q, k, v)
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)

    from flash_attention_tpu import flash_attention

    def mainf(q, k, v):
        return flash_attention(
            q[:, None], k[:, None], v[:, None], causal=True, sm_scale=d**-0.5
        )[:, 0]

    dt = timeit(mainf, q, k, v)
    print(f"MAIN: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
