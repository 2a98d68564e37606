"""Throwaway experiment: can pairing two independent q-blocks per grid step
hide the VPU softmax under the other block's MXU matmul?

The main kernel's effective in-kernel matmul rate is ~91 TF/s vs ~157 for
pure matmul chains at the same shapes: the per-tile dependency chain
QK^T -> exp -> PV serializes MXU and VPU.  Two q-blocks sharing one KV tile
have no data dependency, so Mosaic may interleave block A's exp with block
B's QK^T.  Rectangular non-causal kernels, bf16, (bq, bkv) = (1024, 1024).

  A: baseline  — grid (BH, ni, nj), one q-block per step
  B: paired    — grid (BH, ni/2, nj), q-blocks (i, i + ni/2) per step

Run: python bench/exp_pair.py [--shape 4,12,4096,128]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def _kernel_single(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, nj):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_prev, l_prev = m_scr[...], l_scr[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, 0:1])
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[...] = m_next
    acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        l = l_scr[:, 0:1]
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l))[None].astype(
            o_ref.dtype
        )


def _kernel_pair(
    qa_ref, qb_ref, k_ref, v_ref, oa_ref, ob_ref,
    ma, la, acca, mb, lb, accb, *, nj,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        for m_scr, l_scr, acc_scr in ((ma, la, acca), (mb, lb, accb)):
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    k = k_ref[0]
    v = v_ref[0]
    # Interleave the two independent blocks' phases by hand: both QK^T
    # first, then both softmaxes, then both PVs — giving Mosaic's scheduler
    # non-dependent MXU work to overlap each VPU phase with.
    sa = jax.lax.dot_general(
        qa_ref[0], k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sb = jax.lax.dot_general(
        qb_ref[0], k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    outs = []
    for s, m_scr, l_scr in ((sa, ma, la), (sb, mb, lb)):
        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        outs.append((p, alpha))

    for (p, alpha), acc_scr in zip(outs, (acca, accb)):
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(j == nj - 1)
    def _():
        for o_ref, l_scr, acc_scr in ((oa_ref, la, acca), (ob_ref, lb, accb)):
            l = l_scr[:, 0:1]
            o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l))[
                None
            ].astype(o_ref.dtype)


def run_single(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    return pl.pallas_call(
        functools.partial(_kernel_single, nj=nj),
        grid=(bh, ni, nj),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(q, k, v)


def run_pair(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    half = ni // 2
    qa, qb = q[:, : l // 2], q[:, l // 2 :]
    oa, ob = pl.pallas_call(
        functools.partial(_kernel_pair, nj=nj),
        grid=(bh, half, nj),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qa.shape, q.dtype),
            jax.ShapeDtypeStruct(qb.shape, q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(qa, qb, k, v)
    return jnp.concatenate([oa, ob], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,12,4096,128")
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.1
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d  # non-causal

    for name, fn in (("single", run_single), ("paired", run_pair)):
        @jax.jit
        def chained(q, k, v):
            o = q
            for _ in range(3):
                o = fn(o, k, v)
            return jnp.sum(o.astype(jnp.float32))

        s = chained(q, k, v)
        float(s)
        t0 = time.perf_counter()
        for _ in range(4):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 4 / 3
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)

    # parity
    o1 = run_single(q, k, v)
    o2 = run_pair(q, k, v)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"pair-vs-single max err: {err:.2e}")


if __name__ == "__main__":
    main()
