"""CONCLUSION (measured v5e): G1 in {48,12,4,1} all 5.0-5.9 us/cell —
grid factorization irrelevant.  See exp_chain.py for the real cause.

Throwaway experiment: is the per-cell overhead a function of the GRID
SHAPE (outer parallel-dim size) alone?

Everything else is ruled out (q/o/chain: exp_rowpipe2 T1-T4; kv DMA
pattern: S1-S2 — a kernel with NO kv traffic is just as slow; body
content: mm-only == softmax).  The one structural difference left between
the slow 4k grid (48 x 10) and the fast 16k grid (12 x 136) is the shape.

Here: SAME 480-cell workload (mm-only, fixed q/o blocks, kv streaming,
tables of 480 entries), grid factored as (G1, 480/G1) for
G1 in {48, 12, 4, 1}.  If time falls as G1 shrinks, the cost is a
per-outer-index pipeline restart, and the fix is folding bh into the
arbitrary dimension (with whatever made flat1D slow fixed separately).

Run: python bench/exp_gridshape.py
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


def _kernel(b_tab, i_tab, j_tab, q_ref, k_ref, v_ref, o_ref,
            *, g2, bq, bkv):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    o_ref[...] = pv[None].astype(o_ref.dtype)


def run(q, k, v, *, g1, semantics, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci1, cj1 = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci1.append(i)
            cj1.append(j)
    cb = np.repeat(np.arange(bh, dtype=np.int32), len(ci1))
    ci = np.tile(np.asarray(ci1, np.int32), bh)
    cj = np.tile(np.asarray(cj1, np.int32), bh)
    total = len(cb)
    assert total % g1 == 0
    g2 = total // g1

    def flat(i0, i1):
        return i0 * g2 + i1

    return pl.pallas_call(
        functools.partial(_kernel, g2=g2, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g1, g2),
            in_specs=[
                pl.BlockSpec(
                    (1, bq, d),
                    lambda i0, i1, bt, it, jt: (bt[flat(i0, i1)], 0, 0)),
                pl.BlockSpec(
                    (1, bkv, d),
                    lambda i0, i1, bt, it, jt: (
                        bt[flat(i0, i1)], jt[flat(i0, i1)], 0)),
                pl.BlockSpec(
                    (1, bkv, d),
                    lambda i0, i1, bt, it, jt: (
                        bt[flat(i0, i1)], jt[flat(i0, i1)], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d),
                lambda i0, i1, bt, it, jt: (bt[flat(i0, i1)], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, bq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
    )(jnp.asarray(cb), jnp.asarray(ci), jnp.asarray(cj), q, k, v)


def main():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.06
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5
    ncells = 48 * 10

    def time_fn(name, fn):
        depth = 8

        @jax.jit
        def chained(q, k, v):
            s = jnp.float32(0)
            for t in range(depth):
                o = fn(q, k, v)
                s = s + jnp.sum(o[:1, :1, :1].astype(jnp.float32))
                q = (q + 0e-9 * s).astype(q.dtype)
            return s

        try:
            s = chained(q, k, v)
            float(s)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    for g1 in (48, 12, 4, 1):
        time_fn(f"G1={g1:2d} par/arb",
                functools.partial(run, g1=g1,
                                  semantics=("parallel", "arbitrary")))
    time_fn("G1=48 arb/arb",
            functools.partial(run, g1=48,
                              semantics=("arbitrary", "arbitrary")))


if __name__ == "__main__":
    main()
