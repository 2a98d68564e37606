"""CONCLUSION (measured v5e): T1-T4 all ~5.4 us/cell (q/o/chain ruled out);
S1/S2 kv-pattern variants too (S2 const-kv with NO streaming DMA is
slowest at 5.98!).  U: flat1D 6.15 loses; semantics neutral.  The real
cause was found in exp_chain.py: per-dispatch tunnel latency.

Throwaway experiment: which stream causes the ~6us/row pipeline stall?

mm-only on the compact causal grid at L=4k pays 2.35us/cell over the
matmul floor (≈6us/row); at 16k it's 0.25us/cell.  Candidates: the q-block
change, the o-block change, or the scratch accumulator chain at row
boundaries.  Variants (all mm-only, timing-only, some give WRONG results):

  base: q per-row, o per-row, acc chain        (= exp_rowpipe's mm-only)
  T1  : o written to a FIXED block (no o-block changes)
  T2  : no acc chain (o = pv each cell)
  T3  : q from a FIXED block (no q-block changes)
  T4  : T1+T2+T3 (pure matmul streaming, kv only)

Run: python bench/exp_rowpipe2.py
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


def _cells(ni, nj, bq, bkv):
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def _kernel(i_tab, j_tab, q_ref, k_ref, v_ref, o_ref, acc_scr,
            *, ncells, bq, bkv, chain):
    c = pl.program_id(1)
    i = i_tab[c]
    first = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    if chain:
        acc = jnp.where(first, 0.0, acc_scr[...]) + pv
        acc_scr[...] = acc
    else:
        acc = pv
    o_ref[...] = acc[None].astype(o_ref.dtype)


def run(q, k, v, *, fixed_o=False, fixed_q=False, chain=True,
        bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    o_shape = (bh, bq, d) if fixed_o else q.shape
    o_idx = (lambda b, c, it, jt: (b, 0, 0)) if fixed_o else (
        lambda b, c, it, jt: (b, it[c], 0))
    q_idx = (lambda b, c, it, jt: (b, 0, 0)) if fixed_q else (
        lambda b, c, it, jt: (b, it[c], 0))
    return pl.pallas_call(
        functools.partial(_kernel, ncells=ncells, bq=bq, bkv=bkv, chain=chain),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), q_idx),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), o_idx),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(o_shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), q, k, v)


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
                q = (q + 0e-9 * s).astype(q.dtype)  # serialize the chain
            return s

        s = chained(q, k, v)
        float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    time_fn("base     ", functools.partial(run))
    time_fn("T1 fix-o ", functools.partial(run, fixed_o=True))
    time_fn("T2 nochain", functools.partial(run, chain=False))
    time_fn("T3 fix-q ", functools.partial(run, fixed_q=True))
    time_fn("T4 all   ", functools.partial(
        run, fixed_o=True, fixed_q=True, chain=False))


if __name__ == "__main__":
    main()


# --- U variants: grid structure around the bh dimension ---

def _kernel_flat(b_tab, i_tab, j_tab, q_ref, k_ref, v_ref, o_ref, acc_scr,
                 *, ncells, bq, bkv):
    c = pl.program_id(0)
    i = i_tab[c]
    same_row = jnp.logical_and(
        i_tab[jnp.maximum(c - 1, 0)] == i,
        b_tab[jnp.maximum(c - 1, 0)] == b_tab[c])
    first = jnp.logical_or(c == 0, jnp.logical_not(same_row))
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                     preferred_element_type=jnp.float32)
    acc = jnp.where(first, 0.0, acc_scr[...]) + pv
    acc_scr[...] = acc
    o_ref[...] = acc[None].astype(o_ref.dtype)


def run_flat(q, k, v, *, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    cb = np.repeat(np.arange(bh, dtype=np.int32), len(ci))
    ci_f = np.tile(ci, bh)
    cj_f = np.tile(cj, bh)
    ncells = len(cb)
    return pl.pallas_call(
        functools.partial(_kernel_flat, ncells=ncells, bq=bq, bkv=bkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda c, bt, it, jt: (bt[c], it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda c, bt, it, jt: (bt[c], jt[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda c, bt, it, jt: (bt[c], jt[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda c, bt, it, jt: (bt[c], it[c], 0)),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(jnp.asarray(cb), jnp.asarray(ci_f), jnp.asarray(cj_f), q, k, v)


def run_arb(q, k, v, *, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    return pl.pallas_call(
        functools.partial(_kernel, ncells=ncells, bq=bq, bkv=bkv, chain=True),
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
            dimension_semantics=("arbitrary", "arbitrary")),
    )(jnp.asarray(ci), jnp.asarray(cj), q, k, v)


def main_u():
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
                q = (q + 0e-9 * s).astype(q.dtype)  # serialize the chain
            return s

        s = chained(q, k, v)
        float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    time_fn("base 2D  ", functools.partial(run))
    time_fn("U1 arb2D ", functools.partial(run_arb))
    time_fn("U2 flat1D", functools.partial(run_flat))


# --- S variants: kv stream access pattern (timing-only, wrong math) ---

def run_kvpat(q, k, v, *, pattern, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    n = len(ci)
    if pattern == "seq":
        cj = (np.arange(n, dtype=np.int32) % nj)
    elif pattern == "const":
        cj = np.zeros(n, np.int32)
    ncells = n
    return pl.pallas_call(
        functools.partial(_kernel, ncells=ncells, bq=bq, bkv=bkv, chain=True),
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


def main_s():
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

        s = chained(q, k, v)
        float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    time_fn("S3 causal ", functools.partial(run_kvpat, pattern="causal"))
    time_fn("S1 seq    ", functools.partial(run_kvpat, pattern="seq"))
    time_fn("S2 const  ", functools.partial(run_kvpat, pattern="const"))
