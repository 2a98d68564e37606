"""Throwaway experiment: one-step-deferred PV accumulation.

The per-tile chain QK^T -> exp -> PV serializes MXU and VPU (in-kernel
effective matmul ~91 vs ~157 TF/s pure, DESIGN.md §1).  Variant: at grid
step j compute s_j = QK^T and its softmax, but accumulate the PREVIOUS
tile's PV (p_{j-1} @ v_{j-1}, p and alpha staged in VMEM scratch) — PV_{j-1}
is independent of exp_j, giving Mosaic MXU work to overlap the VPU phase.
The last pending tile is flushed in the store epilogue; v blocks stay
resident one extra step via a v scratch copy.

Compared against exp_pair.py's single (baseline) and paired kernels on the
same non-causal rectangular harness.

Run: python bench/exp_defer.py [--shape 4,12,4096,128]
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

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "exp_pair", __file__.replace("exp_defer", "exp_pair")
)
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
run_pair, run_single = _mod.run_pair, _mod.run_single


def _kernel_defer(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, p_scr, a_scr, v_scr,
    *, nj,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # Phase 1 (this tile): QK^T + online softmax -> p_j, alpha_j
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

    # Phase 2 (previous tile): acc = acc * alpha_{j-1} + p_{j-1} @ v_{j-1}
    # Independent of phase 1's exp -> Mosaic can overlap them.
    @pl.when(j > 0)
    def _():
        acc_scr[...] = acc_scr[...] * a_scr[:, 0:1] + jax.lax.dot(
            p_scr[...], v_scr[...], preferred_element_type=jnp.float32
        )

    # Stage this tile for the next step.
    p_scr[...] = p.astype(p_scr.dtype)
    a_scr[...] = alpha
    v_scr[...] = v_ref[0]

    @pl.when(j == nj - 1)
    def _():
        # Flush the pending tile, then normalize and store.
        acc = acc_scr[...] * a_scr[:, 0:1] + jax.lax.dot(
            p_scr[...], v_scr[...], preferred_element_type=jnp.float32
        )
        l = l_scr[:, 0:1]
        o_ref[...] = (acc / jnp.where(l == 0, 1.0, l))[None].astype(o_ref.dtype)


def run_defer(q, k, v, bq=1024, bkv=1024):
    bh, l, d = q.shape
    ni, nj = l // bq, l // bkv
    return pl.pallas_call(
        functools.partial(_kernel_defer, nj=nj),
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
            pltpu.VMEM((bq, bkv), jnp.bfloat16),  # staged p
            pltpu.VMEM((bq, 128), jnp.float32),   # staged alpha
            pltpu.VMEM((bkv, d), jnp.bfloat16),   # staged v
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(q, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,12,4096,128")
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.1
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d  # non-causal

    def timer(fn):
        @jax.jit
        def chained(q, k, v):
            o, _ = jax.lax.scan(
                lambda o, _: (fn(o, k, v), None), q, None, length=args.depth
            )
            return jnp.sum(o.astype(jnp.float32))

        float(chained(q, k, v))  # compile
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(chained(q, k, v))
            best = min(best, (time.perf_counter() - t0) / args.depth)
        return best

    # INTERLEAVED same-session A/B (round-4 discipline): base, variants,
    # base again — the base spread is the session's drift band.
    results = []
    for name, fn in (
        ("single", run_single), ("defer", run_defer),
        ("paired", run_pair), ("single#2", run_single),
    ):
        dt = timer(fn)
        results.append((name, dt))
        print(f"{name:9s}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)
    base = min(dt for n, dt in results if n.startswith("single"))
    defer = dict(results)["defer"]
    print(
        f"defer vs best-single: {(base/defer - 1)*100:+.1f}% "
        f"(drift band: singles "
        f"{abs(results[0][1]-results[3][1])/base*100:.1f}%)",
        flush=True,
    )

    o1 = run_single(q, k, v)
    o3 = run_defer(q, k, v)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o3.astype(jnp.float32))))
    print(f"defer-vs-single max err: {err:.2e}")


if __name__ == "__main__":
    main()
