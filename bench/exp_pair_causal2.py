"""CONCLUSION (measured v5e): split-pair 63.0 TF/s vs repo 70.0 — LOSES.
Half-width matmuls cost more than any interleave gain; parity bit-exact.

Throwaway experiment v2: split-tile interleaving for the causal kernel.

exp_pair_causal.py (adjacent 1024-row pairs, 1024-col kv) OOMs VMEM at the
headline shape: two fp32 (1024, 1024) score tiles plus the masked branch's
int32 iotas blow the 16 MB scoped limit (19.65M).  This version keeps the
1024x1024 *tile* geometry that wins for the single kernel but splits the q
tile into two independent 512-row halves sharing one 1024-col KV block:

  pair p covers q rows [1024p, 1024(p+1)); kv tile j covers [1024j, ...).
  j < p : both halves fully visible (no mask)
  j == p: both halves diagonal-masked (one masked cell per pair)

Each half runs its own online-softmax chain, phases interleaved by hand
(both QK^T, both softmax, both PV) so Mosaic can overlap half A's exp (VPU)
with half B's matmul (MXU).  Score tiles are (512, 1024) fp32 = 2 MB each.

Timing matches bench.py: depth-8 chained jit, scalar fetch.  Parity vs the
repo's flash_attention (same sm_scale) on the same inputs.

Run: python bench/exp_pair_causal2.py [--shape 4,12,4096,128]
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
_LOG2E = 1.4426950408889634


def _cells(npairs, bqq=1024, bkv=1024):
    cp, cj = [], []
    for p in range(npairs):
        for j in range(p + 1):
            cp.append(p)
            cj.append(j)
    return np.asarray(cp, np.int32), np.asarray(cj, np.int32)


def _kernel(p_tab, j_tab, q_ref, k_ref, v_ref, o_ref,
            ma, la, acca, mb, lb, accb, *, ncells, hq, bkv, d):
    """hq = 512 rows per half; q/o blocks are (1, 2*hq, d)."""
    c = pl.program_id(1)
    p_idx, j = p_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, p_tab[jnp.maximum(c - 1, 0)] != p_idx)
    store = jnp.logical_or(
        c == ncells - 1, p_tab[jnp.minimum(c + 1, ncells - 1)] != p_idx)

    @pl.when(init)
    def _():
        for m_scr, l_scr, acc_scr in ((ma, la, acca), (mb, lb, accb)):
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q2 = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    def halves(masked: bool):
        qa = q2[:hq]
        qb = q2[hq:]
        sa = jax.lax.dot_general(qa, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(qb, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if masked:
            # Diagonal tile (j == p): rows of half h sit at
            # (2p + h) * hq + r, cols at j * bkv + cc.  With bkv = 2 * hq
            # and j == p the A-half condition is cc <= r, B is cc <= r + hq.
            rp = jax.lax.broadcasted_iota(jnp.int32, (hq, bkv), 0)
            cp_ = jax.lax.broadcasted_iota(jnp.int32, (hq, bkv), 1)
            sa = sa + jnp.where(cp_ <= rp, 0.0, MASK)
            sb = sb + jnp.where(cp_ <= rp + hq, 0.0, MASK)
        ps = []
        for s, m_scr, l_scr in ((sa, ma, la), (sb, mb, lb)):
            m_prev, l_prev = m_scr[...], l_scr[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, 0:1])
            l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[...] = m_next
            ps.append((p, alpha))
        for (p, alpha), acc_scr in zip(ps, (acca, accb)):
            acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    diag = j == p_idx

    @pl.when(diag)
    def _():
        halves(True)

    @pl.when(jnp.logical_not(diag))
    def _():
        halves(False)

    @pl.when(store)
    def _():
        la_ = la[:, 0:1]
        lb_ = lb[:, 0:1]
        oa = acca[...] / jnp.where(la_ == 0, 1.0, la_)
        ob = accb[...] / jnp.where(lb_ == 0, 1.0, lb_)
        o_ref[...] = jnp.concatenate([oa, ob], axis=0)[None].astype(o_ref.dtype)


def run_paired(q, k, v, sm_scale):
    bh, l, d = q.shape
    hq, bkv = 512, 1024
    npairs = l // (2 * hq)
    cp, cj = _cells(npairs)
    ncells = len(cp)
    q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, ncells=ncells, hq=hq, bkv=bkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, 2 * hq, d), lambda b, c, pt, jt: (b, pt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, pt, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, pt, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * hq, d), lambda b, c, pt, jt: (b, pt[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((512, 128), jnp.float32),
                pltpu.VMEM((512, 128), jnp.float32),
                pltpu.VMEM((512, d), jnp.float32),
                pltpu.VMEM((512, 128), jnp.float32),
                pltpu.VMEM((512, 128), jnp.float32),
                pltpu.VMEM((512, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(cp), jnp.asarray(cj), q, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,12,4096,128")
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    from flash_attention_tpu.kernels import flash_attention

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

    time_fn("repo-flash ", lambda a, b_, c: flash_attention(
        a.reshape(b, h, l, d), k4, v4).reshape(b * h, l, d), q, k, v)
    time_fn("split-pair ", functools.partial(run_paired, sm_scale=sm), q, k, v)

    o_ref = flash_attention(q4, k4, v4).reshape(b * h, l, d)
    o2 = run_paired(q, k, v, sm)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"split-pair vs repo max err: {err:.2e}")


if __name__ == "__main__":
    main()
