"""Throwaway experiment: fused single-pass backward kernel.

Current backward = two kernels (_bwd_dkv kv-major + _bwd_dq q-major), each
recomputing p and dp per (i,j) cell: 7 matmuls/cell total.  Fused variant:
one q-major pass with dk/dv accumulated in whole-sequence VMEM scratch,
5 matmuls/cell and half the stream traffic.  Feasible when
2 * Lkv * d * 4 bytes of scratch fits VMEM alongside the tiles.

Prototype scope: causal, group=1, no window/segments, aligned lengths.
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


def cells_qmajor(ni, nj, bq, bkv):
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def fused_kernel(
    i_tab, j_tab, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr,
    *, bq, bkv, ncells, sm_scale,
):
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    row_start = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    row_end = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
    )

    @pl.when(c == 0)
    def _():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    @pl.when(row_start)
    def _():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    def body(masked):
        q = q_ref[0]  # pre-scaled by sm_scale * log2e
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = s + jnp.where(col <= row, 0.0, MASK)
        lse = lse_ref[0].reshape(bq, 1)
        p = jnp.exp2(s - lse * LOG2E)
        # dv_j += p^T @ do
        rows_j = pl.ds(j * bkv, bkv)
        dv_scr[rows_j, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        di = di_ref[0].reshape(bq, 1)
        ds = p * (dp - di) * sm_scale
        dsl = ds.astype(k.dtype)
        dq_scr[...] += jax.lax.dot(dsl, k, preferred_element_type=jnp.float32)
        # dk_j += ds^T @ q_scaled  (unscaled at the final store)
        dk_scr[rows_j, :] += jax.lax.dot_general(
            dsl, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == j)
    def _():
        body(True)

    @pl.when(i != j)
    def _():
        body(False)

    @pl.when(row_end)
    def _():
        dq_ref[...] = dq_scr[...].reshape(dq_ref.shape).astype(dq_ref.dtype)

    @pl.when(c == ncells - 1)
    def _():
        unscale = 1.0 / (sm_scale * LOG2E)
        dk_ref[...] = (
            (dk_scr[...] * unscale).reshape(dk_ref.shape).astype(dk_ref.dtype)
        )
        dv_ref[...] = dv_scr[...].reshape(dv_ref.shape).astype(dv_ref.dtype)


def fused_bwd(q, k, v, do, lse, di, bq=512, bkv=512, sm_scale=None):
    bh, l, d = q.shape
    lk = k.shape[1]
    sm_scale = sm_scale if sm_scale is not None else d**-0.5
    qs = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, lk // bkv
    ci, cj = cells_qmajor(ni, nj, bq, bkv)
    ncells = len(ci)
    kern = functools.partial(
        fused_kernel, bq=bq, bkv=bkv, ncells=ncells, sm_scale=sm_scale
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
                pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c])),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, lk, d), lambda b, c, it, jt: (b, 0, 0)),
                pl.BlockSpec((1, lk, d), lambda b, c, it, jt: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((lk, d), jnp.float32),
                pltpu.VMEM((lk, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), qs, k, v, do, lse, di)


def current_bwd(q, k, v, do, lse, di, sm_scale=None):
    from flash_attention_tpu.kernels.flash_attention import (
        _Params, _bwd_dkv, _bwd_dq,
    )
    from flash_attention_tpu.kernels.block_sizes import (
        default_blocks, resolve_bwd_blocks,
    )

    bh, l, d = q.shape
    sm_scale = sm_scale if sm_scale is not None else d**-0.5
    blocks = resolve_bwd_blocks(default_blocks(l, l, d), l, l)
    params = _Params(
        sm_scale=sm_scale, causal=True, q_len=l, kv_len=l, blocks=blocks
    )
    q4, do4 = q[:, None], do[:, None]
    lse3, di3 = lse, di  # already (bh, 1, l)
    dk, dv = _bwd_dkv(params, q4, k, v, do4, lse3, di3)
    dq = _bwd_dq(params, q4, k, v, do4, lse3, di3)
    return dq[:, 0], dk, dv


def main():
    b, h, l, d = 4, 12, 2048, 128
    bh = b * h
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (bh, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, l, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (bh, l, d), jnp.bfloat16)
    sm = d**-0.5

    # produce o/lse with the real forward (exact: fp32 dense on small slice
    # would differ in lse domain; use the package fwd kernel)
    from flash_attention_tpu.kernels.flash_attention import (
        _Params, _fwd,
    )
    from flash_attention_tpu.kernels.block_sizes import default_blocks

    params = _Params(
        sm_scale=sm, causal=True, q_len=l, kv_len=l,
        blocks=default_blocks(l, l, d),
    )
    o, lse = jax.jit(
        lambda q, k, v: _fwd(params, q[:, None], k, v)
    )(q, k, v)
    o = o[:, 0]
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = di[:, None, :]  # (bh, 1, l)

    # parity: fused vs current
    f_new = jax.jit(lambda *a: fused_bwd(*a))
    f_old = jax.jit(lambda *a: current_bwd(*a))
    dq_n, dk_n, dv_n = f_new(q, k, v, do, lse, di)
    dq_o, dk_o, dv_o = f_old(q, k, v, do, lse, di)
    for n, x, y in (("dq", dq_n, dq_o), ("dk", dk_n, dk_o), ("dv", dv_n, dv_o)):
        err = float(
            jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
        )
        print(f"parity {n}: {err:.4g}", flush=True)

    # timing: chain via do -> dq feedback to defeat dispatch latency
    def timeit(f, label, iters=3, depth=8):
        @jax.jit
        def chained(q, k, v, do, lse, di):
            g = do
            for _ in range(depth):
                dq, dk, dv = f(q, k, v, g, lse, di)
                g = (dq + 0.0).astype(do.dtype)
            return jnp.sum(dq.astype(jnp.float32)) + jnp.sum(
                dk.astype(jnp.float32)
            )

        s = chained(q, k, v, do, lse, di)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = chained(q, k, v, do, lse, di)
        float(s)
        dt = (time.perf_counter() - t0) / iters / depth
        fwd_flops = 4 * bh * l * l * d * 0.5
        bwd_flops = fwd_flops * 2.5  # 5 matmuls/cell vs fwd's 2
        print(
            f"{label}: {dt*1e3:.3f} ms  {bwd_flops/dt/1e12:.1f} TF/s (bwd)",
            flush=True,
        )

    for bq, bkv in ((512, 512), (1024, 512), (512, 1024), (1024, 1024)):
        try:
            fb = functools.partial(fused_bwd, bq=bq, bkv=bkv)
            # quick parity guard per config
            dq_t, dk_t, dv_t = jax.jit(lambda *a: fb(*a))(q, k, v, do, lse, di)
            err = float(jnp.max(jnp.abs(dk_t.astype(jnp.float32) - dk_o.astype(jnp.float32))))
            timeit(lambda *a: fb(*a), f"fused {bq}x{bkv} (dk err {err:.3g})")
        except Exception as e:
            print(f"fused {bq}x{bkv}: FAIL {str(e)[:130]}", flush=True)
    timeit(current_bwd, "current two-kernel")


if __name__ == "__main__" and "--sweep" not in sys.argv:
    main()


def main_sweep():
    """Sweep the CURRENT two-kernel backward's block sizes."""
    from flash_attention_tpu.kernels.flash_attention import (
        _Params, _bwd_dkv, _bwd_dq, _fwd,
    )
    from flash_attention_tpu.kernels.block_sizes import BlockSizes, default_blocks

    b, h, l, d = 4, 12, 2048, 128
    bh = b * h
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (bh, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, l, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (bh, l, d), jnp.bfloat16)
    sm = d**-0.5
    params0 = _Params(sm_scale=sm, causal=True, q_len=l, kv_len=l,
                      blocks=default_blocks(l, l, d))
    o, lse = jax.jit(lambda q, k, v: _fwd(params0, q[:, None], k, v))(q, k, v)
    o = o[:, 0]
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]

    def bwd_with(blocks):
        params = _Params(sm_scale=sm, causal=True, q_len=l, kv_len=l, blocks=blocks)
        def f(q, k, v, do, lse, di):
            dk, dv = _bwd_dkv(params, q[:, None], k, v, do[:, None], lse, di)
            dq = _bwd_dq(params, q[:, None], k, v, do[:, None], lse, di)
            return dq[:, 0], dk, dv
        return f

    def timeit(f, label, iters=3, depth=8):
        @jax.jit
        def chained(q, k, v, do, lse, di):
            g = do
            for _ in range(depth):
                dq, dk, dv = f(q, k, v, g, lse, di)
                g = (dq + 0.0).astype(do.dtype)
            return jnp.sum(dq.astype(jnp.float32)) + jnp.sum(dk.astype(jnp.float32))
        s = chained(q, k, v, do, lse, di); float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = chained(q, k, v, do, lse, di)
        float(s)
        dt = (time.perf_counter() - t0) / iters / depth
        bwd_flops = 4 * bh * l * l * d * 0.5 * 2.5
        print(f"{label}: {dt*1e3:.3f} ms  {bwd_flops/dt/1e12:.1f} TF/s (bwd)", flush=True)

    for bq, bkv in ((512, 512), (1024, 512), (512, 1024), (1024, 1024), (256, 512), (512, 256)):
        blocks = BlockSizes(block_q=1024, block_kv=1024,
                            block_q_dkv=bq, block_kv_dkv=bkv,
                            block_q_dq=bq, block_kv_dq=bkv)
        try:
            timeit(bwd_with(blocks), f"two-kernel dkv/dq {bq}x{bkv}")
        except Exception as e:
            print(f"two-kernel {bq}x{bkv}: FAIL {str(e)[:130]}", flush=True)


if __name__ == "__main__" and "--sweep" in sys.argv:
    main_sweep()
