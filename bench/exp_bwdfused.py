"""CONCLUSION (measured v5e, same-session best-of): fused LOSES — 2.310
vs 2.022 ms fwd+bwd at the train shape (13.9 vs 15.9 TF/s).  Grad parity
is clean (<=6.1e-5), but the single 1024^2 cell visits the full square
(ratio 2.0) while the shipped 512-split visits 1.5x counted; the saved
recompute matmul chain + exp (5.0 units/1 exp vs 5.25/1.5) does not
cover the 33% extra visited work.  Same verdict as the big-bwd-tile
sweep: at this shape visited-cell geometry dominates everything else.

Round-4 experiment: FUSED single-cell backward (dq+dk+dv in one kernel).

At the GPT-2 train shape (L=1024, D=64) the whole attention problem fits
one tile, so the backward can be ONE pallas call per bh row: recompute p
once, derive ds once, and emit all three gradients — versus the shipped
two-kernel split (dKV kv-outer + dQ q-outer, each recomputing p at
512-capped blocks).

Accounting per bh row (full-square matmul = 1 unit):
  split at (512,512): 7 matmuls x 0.75 visited = 5.25 units, exp twice
  fused at 1024^2:    5 matmuls x 1.0 = 5.0 units, exp once, no scratch

Run: python bench/exp_bwdfused.py

NOTE (post round 4): utils/measure.py (chain_timer / ab_compare) is the
canonical timing protocol — sync-per-iteration best-of-N with an
interleaved drift band.  The local harness below predates it (it queues
iterations and syncs once, a mean) and is kept verbatim because the
recorded CONCLUSION numbers were produced with it; use utils.measure
for NEW measurements.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from flash_attention_tpu.kernels import BlockSizes, flash_attention  # noqa: E402
from flash_attention_tpu.kernels.vanilla import (  # noqa: E402
    DEFAULT_MASK_VALUE,
    vanilla_attention,
)

_LOG2E = 1.4426950408889634


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale, lq, lk,
):
    q = q_ref[0]  # (lq, d) — pre-scaled by sm_scale*log2e
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
    lse = lse_ref[0, 0].reshape(lq, 1)
    p = jnp.exp2(s - lse * _LOG2E)
    # dv = p^T @ do
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[...] = dv.reshape(1, lk, -1).astype(dv_ref.dtype)
    # dp = do @ v^T
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    di = di_ref[0, 0].reshape(lq, 1)
    ds = p * (dp - di) * sm_scale
    dsc = ds.astype(q.dtype)
    # dk = ds^T @ q / (sm_scale*log2e)
    dk = jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[...] = (dk * (1.0 / (sm_scale * _LOG2E))).reshape(1, lk, -1).astype(
        dk_ref.dtype
    )
    # dq = ds @ k
    dq = jax.lax.dot(dsc, k, preferred_element_type=jnp.float32)
    dq_ref[...] = dq.reshape(1, lq, -1).astype(dq_ref.dtype)


def fused_bwd(q, k, v, do, o, lse, *, sm_scale):
    """q..do: [BH, L, D]; o, lse residuals.  Returns (dq, dk, dv)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
    kernel = functools.partial(
        _fused_bwd_kernel, sm_scale=sm_scale, lq=lq, lk=lk
    )
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, lq, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, lq, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qs, k, v, do, lse.reshape(bh, 1, lq), di.reshape(bh, 1, lq))


def main():
    b, h, l, d = 8, 12, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    sm = float(d) ** -0.5
    cflops = 4 * b * h * l * l * d * 0.5

    # --- parity: fused bwd vs autodiff of vanilla ---
    from flash_attention_tpu.kernels.flash_attention import (  # noqa: E402
        flash_attention_with_lse,
    )

    def loss(f):
        return lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32) * 0.001)

    g_ref = jax.jit(
        jax.grad(
            loss(lambda q, k, v: vanilla_attention(q, k, v, causal=True, sm_scale=sm)),
            argnums=(0, 1, 2),
        )
    )
    r = g_ref(q, k, v)

    @jax.jit
    def fused_grads(q, k, v):
        o, lse = flash_attention_with_lse(q, k, v, causal=True, sm_scale=sm)
        do = jnp.full_like(o, 0.001)
        q3 = q.reshape(b * h, l, d)
        dq, dk, dv = fused_bwd(
            q3, k.reshape(b * h, l, d), v.reshape(b * h, l, d),
            do.reshape(b * h, l, d), o.reshape(b * h, l, d),
            lse.reshape(b * h, l), sm_scale=sm,
        )
        return (
            dq.reshape(b, h, l, d), dk.reshape(b, h, l, d), dv.reshape(b, h, l, d)
        )

    n = fused_grads(q, k, v)
    for nm, a, bb in zip("dq dk dv".split(), r, n):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
        print(f"grad parity {nm}: {err:.2e}", flush=True)

    # --- timing: bwd only (fused) vs the shipped custom_vjp bwd, same session ---
    def timeit(fn, *args, iters=3, depth=24):
        @jax.jit
        def chained(*args):
            def body(carry, _):
                out = fn(*carry)
                qq = carry[0] + 1e-6 * out[0].astype(carry[0].dtype)
                return (qq,) + carry[1:], None

            carry, _ = jax.lax.scan(body, args, None, length=depth)
            return jnp.sum(carry[0].astype(jnp.float32))

        float(chained(*args))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            s = chained(*args)
            float(s)
            best = min(best, time.perf_counter() - t0)
        return best / depth

    # shipped fwd+bwd with default blocks
    f_cur = functools.partial(flash_attention, causal=True)
    g_cur = jax.grad(
        lambda q, k, v: jnp.sum(f_cur(q, k, v).astype(jnp.float32)),
        argnums=(0, 1, 2),
    )
    dt = timeit(lambda q, k, v: (g_cur(q, k, v)[0], k, v), q, k, v)
    print(f"shipped fwd+bwd: {dt*1e3:7.3f} ms  {2.5*cflops/dt/1e12:5.1f} TF/s", flush=True)

    # fused: fwd (with lse) + fused bwd
    def fwd_plus_fused(q, k, v):
        dq, dk, dv = fused_grads(q, k, v)
        return (dq, k, v)

    dt = timeit(fwd_plus_fused, q, k, v)
    print(f"fwd + fused bwd: {dt*1e3:7.3f} ms  {2.5*cflops/dt/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
