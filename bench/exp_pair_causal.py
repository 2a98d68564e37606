"""CONCLUSION (measured v5e): 1024^2 pair OOMs scoped VMEM (19.65M > 16M);
512^2 pair 36.4 vs 38.0 single — LOSES.

Throwaway experiment: q-block pairing for the CAUSAL compact-grid kernel.

exp_pair.py showed two independent q-blocks sharing one KV tile let Mosaic
overlap one block's exp (VPU) with the other's matmuls (MXU): +33% on the
non-causal rectangular kernel.  This prototypes the causal version: pair
adjacent q-blocks (2p, 2p+1), walk j over [0, last(2p+1)] with a compact
scalar-prefetched cell table, and dispatch three statically-masked branches:

  j <  2p   : both blocks active, no masks      (interleaved phases)
  j == 2p   : A diagonal-masked, B active       (interleaved phases)
  j == 2p+1 : A skipped (above diagonal), B diagonal-masked

No wasted FLOPs (the skip branch), full interleave coverage on every cell
where both blocks are admitted.  group=1, no window/segments — prototype.

Run: python bench/exp_pair_causal.py [--shape 4,12,4096,128] [--bq 1024 --bkv 1024]
"""

from __future__ import annotations

import argparse
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


def _cells_single(ni, nj, bq, bkv):
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def _kernel_single(i_tab, j_tab, q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, ncells, bq, bkv):
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i)

    @pl.when(init)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(masked: bool):
        q = q_ref[0]
        s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
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
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)

    diag = (j + 1) * bkv - 1 > i * bq  # tile crosses the diagonal

    @pl.when(diag)
    def _():
        body(True)

    @pl.when(jnp.logical_not(diag))
    def _():
        body(False)

    @pl.when(store)
    def _():
        l = l_scr[:, 0:1]
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l))[None].astype(o_ref.dtype)


def run_causal_single(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells_single(ni, nj, bq, bkv)
    ncells = len(ci)
    return pl.pallas_call(
        functools.partial(_kernel_single, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
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


def _cells_paired(ni, nj, bq, bkv):
    """Pair-major cells: pair p covers q blocks (2p, 2p+1), j in
    [0, last(2p+1)]."""
    cp, cj = [], []
    for p in range(ni // 2):
        j1 = min(((2 * p + 2) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            cp.append(p)
            cj.append(j)
    return np.asarray(cp, np.int32), np.asarray(cj, np.int32)


def _kernel_paired(p_tab, j_tab, q_ref, k_ref, v_ref, o_ref,
                   ma, la, acca, mb, lb, accb, *, ncells, bq, bkv):
    c = pl.program_id(1)
    p_idx, j = p_tab[c], j_tab[c]
    ia = 2 * p_idx
    ib = ia + 1
    init = jnp.logical_or(c == 0, p_tab[jnp.maximum(c - 1, 0)] != p_idx)
    store = jnp.logical_or(
        c == ncells - 1, p_tab[jnp.minimum(c + 1, ncells - 1)] != p_idx)

    @pl.when(init)
    def _():
        for m_scr, l_scr, acc_scr in ((ma, la, acca), (mb, lb, accb)):
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q2 = q_ref[0]  # (2*bq, d)
    k = k_ref[0]
    v = v_ref[0]

    def halves(mask_a: bool, mask_b: bool, skip_a: bool):
        """Interleaved pair phases: both QK^T, both softmax, both PV."""
        qa = q2[:bq]
        qb = q2[bq:]
        ss = []
        if not skip_a:
            ss.append((qa, ia, mask_a, ma, la, acca))
        ss.append((qb, ib, mask_b, mb, lb, accb))
        scores = [
            jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for qh, *_ in ss
        ]
        ps = []
        for s, (qh, i, masked, m_scr, l_scr, acc_scr) in zip(scores, ss):
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
            ps.append((p, alpha))
        for (p, alpha), (qh, i, masked, m_scr, l_scr, acc_scr) in zip(ps, ss):
            acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    # Static-mask dispatch on where the tile sits relative to the diagonals.
    a_diag = (j + 1) * bkv - 1 > ia * bq
    a_gone = j * bkv > (ia + 1) * bq - 1  # fully above A's diagonal

    @pl.when(jnp.logical_not(a_diag))
    def _():
        halves(False, False, False)  # both fully visible

    # With bq == bkv the middle branch (A's diagonal tile) always has B
    # fully visible, and the last branch (A gone) is B's diagonal tile.
    @pl.when(jnp.logical_and(a_diag, jnp.logical_not(a_gone)))
    def _():
        halves(True, False, False)

    @pl.when(a_gone)
    def _():
        halves(False, True, True)  # A skipped, B masked

    @pl.when(store)
    def _():
        outs = []
        for l_scr, acc_scr in ((la, acca), (lb, accb)):
            l = l_scr[:, 0:1]
            outs.append(acc_scr[...] / jnp.where(l == 0, 1.0, l))
        o_ref[...] = jnp.concatenate(outs, axis=0)[None].astype(o_ref.dtype)


def run_causal_paired(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    assert ni % 2 == 0 and bq == bkv, "prototype restriction"
    cp, cj = _cells_paired(ni, nj, bq, bkv)
    ncells = len(cp)
    return pl.pallas_call(
        functools.partial(_kernel_paired, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, 2 * bq, d), lambda b, c, pt, jt: (b, pt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, pt, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, pt, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * bq, d), lambda b, c, pt, jt: (b, pt[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(cp), jnp.asarray(cj), q, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,12,4096,128")
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--bkv", type=int, default=1024)
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    bq, bkv = args.bq, args.bkv
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.1
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5  # causal

    runs = (
        ("causal-single", functools.partial(run_causal_single, bq=bq, bkv=bkv)),
        ("causal-paired", functools.partial(run_causal_paired, bq=bq, bkv=bkv)),
    )
    for name, fn in runs:
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

    o1 = run_causal_single(q, k, v, bq=bq, bkv=bkv)
    o2 = run_causal_paired(q, k, v, bq=bq, bkv=bkv)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"paired-vs-single max err: {err:.2e}")


if __name__ == "__main__":
    main()
