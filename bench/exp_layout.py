"""Round-4 experiment: attention wrapper costs + fwd kernel VPU trims.

Round-4 decomposition: attention costs 24.6 ms in-step vs 15.6 ms
isolated.  Suspects: the [B,T,H,D] <-> [B,H,T,D] transposes around the
kernel (Pallas operands must be materialized, so XLA cannot fuse them),
the q pre-scale pass, di, and vjp glue.

NOTE: a true layout-native kernel (per-head tiles straight out of
[B, L, H, D]) is IMPOSSIBLE at GPT-2's H=12, D=64 — Mosaic requires the
last two block dims divisible by (8, 128) or equal to the array dims,
and any per-head slice of H=12 / D=64 violates that.  So the fix must
either live with one layout change or restructure the model's matmuls.

Measures (depth-scan discipline):
  A. fwd kernel on pre-transposed [B,H,L,D] (no wrapper)
  B. fwd transpose -> kernel -> transpose (the model path from BLHD)
  C. fwd+bwd of A vs B (transposes mirror in the backward)
  D. kernel variants on BHLD:
     v2 ones-column l: V gains a ones column so the softmax row sum
        rides the PV matmul's idle output lanes (d=64: 64 idle lanes)
     v3 v2 + single-pass: skip running-max machinery when each q row
        has exactly one kv cell (the train-shape geometry)

Run: python bench/exp_layout.py [--shape 8,12,1024,64]

NOTE (post round 4): utils/measure.py (chain_timer / ab_compare) is the
canonical timing protocol — sync-per-iteration best-of-N with an
interleaved drift band.  The local harness below predates it (it queues
iterations and syncs once, a mean) and is kept verbatim because the
recorded CONCLUSION numbers were produced with it; use utils.measure
for NEW measurements.
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
from flash_attention_tpu.kernels import BlockSizes, flash_attention  # noqa: E402
from flash_attention_tpu.kernels.vanilla import DEFAULT_MASK_VALUE  # noqa: E402

_LOG2E = 1.4426950408889634


def _cells(ni, nj, bq, bkv):
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def _kernel(
    i_tab, j_tab, q_ref, k_ref, v_ref, o_ref, *scratch,
    bq, bkv, ncells, ones_l, single_pass, d,
):
    if ones_l:
        m_scr, acc_scr = scratch
        l_scr = None
    else:
        m_scr, l_scr, acc_scr = scratch
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i)

    if not single_pass:
        @pl.when(init)
        def _():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            if l_scr is not None:
                l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
    s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)

    if single_pass:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        if ones_l:
            l = acc[:, d:d + 1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[...] = (acc[:, :d] / l).reshape(1, bq, d).astype(o_ref.dtype)
        else:
            l = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[...] = (acc / l).reshape(1, bq, d).astype(o_ref.dtype)
        return

    m_prev = m_scr[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, 0:1])
    m_scr[...] = m_next
    if not ones_l:
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(store)
    def _():
        if ones_l:
            l = acc_scr[:, d:d + 1]
        else:
            l = l_scr[:, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scr[:, :d] / l).reshape(1, bq, d).astype(o_ref.dtype)


def variant_attention(q, k, v, *, bq=1024, bkv=1024, ones_l=False, single_pass=False):
    """q, k, v: [B, H, L, D] MHA.  Causal.  Returns [B, H, L, D]."""
    b, h, l, d = q.shape
    sm = float(d) ** -0.5
    q = (q.astype(jnp.float32) * (sm * _LOG2E)).astype(q.dtype)
    q3 = q.reshape(b * h, l, d)
    k3 = k.reshape(b * h, l, d)
    v3 = v.reshape(b * h, l, d)
    ni, nj = l // bq, l // bkv
    ci, cj = _cells(ni, nj, bq, bkv)
    ncells = len(ci)
    if single_pass:
        assert ncells == ni, "single_pass requires one cell per q row"
    dv = d
    if ones_l:
        dv = d + 8
        pad = jnp.concatenate(
            [jnp.ones((b * h, l, 1), v3.dtype), jnp.zeros((b * h, l, 7), v3.dtype)],
            axis=-1,
        )
        v3 = jnp.concatenate([v3, pad], axis=-1)
    kernel = functools.partial(
        _kernel, bq=bq, bkv=bkv, ncells=ncells, ones_l=ones_l,
        single_pass=single_pass, d=d,
    )
    scratch = [pltpu.VMEM((bq, 128), jnp.float32)]
    if not ones_l:
        scratch.append(pltpu.VMEM((bq, 128), jnp.float32))
    scratch.append(pltpu.VMEM((bq, dv), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * h, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, c, it, jt: (bh, it[c], 0)),
                pl.BlockSpec((1, bkv, d), lambda bh, c, it, jt: (bh, jt[c], 0)),
                pl.BlockSpec((1, bkv, dv), lambda bh, c, it, jt: (bh, jt[c], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, c, it, jt: (bh, it[c], 0)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), q3, k3, v3)[0]
    return out.reshape(b, h, l, d)


def kernel_only(q, k, v):
    return flash_attention(q, k, v, causal=True, block_sizes=BlockSizes(1024, 1024))


def model_path(q_blhd, k_blhd, v_blhd):
    """The shipped path including its transposes, from BLHD activations."""
    q = q_blhd.transpose(0, 2, 1, 3)
    k = k_blhd.transpose(0, 2, 1, 3)
    v = v_blhd.transpose(0, 2, 1, 3)
    y = flash_attention(q, k, v, causal=True, block_sizes=BlockSizes(1024, 1024))
    return y.transpose(0, 2, 1, 3)


def timeit_fwd(f, q, k, v, iters=3, depth=64):
    @jax.jit
    def chained(q, k, v):
        o, _ = jax.lax.scan(lambda o, _: (f(o, k, v), None), q, None, length=depth)
        return jnp.sum(o.astype(jnp.float32))

    float(chained(q, k, v))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(q, k, v)
    float(s)
    return (time.perf_counter() - t0) / iters / depth


def timeit_fwdbwd(f, q, k, v, iters=3, depth=24):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chained(q, k, v):
        def body(carry, _):
            q, k, v = carry
            dq, dk, dv = g(q, k, v)
            return (
                q + 1e-6 * dq.astype(q.dtype),
                k + 1e-6 * dk.astype(k.dtype),
                v + 1e-6 * dv.astype(v.dtype),
            ), None

        (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=depth)
        return jnp.sum(q.astype(jnp.float32))

    float(chained(q, k, v))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained(q, k, v)
    float(s)
    return (time.perf_counter() - t0) / iters / depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8,12,1024,64")
    ap.add_argument("--depth", type=int, default=64)
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    # BHLD tensors (A, D variants); BLHD views for the model path (B)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    cflops = 4 * b * h * l * l * d * 0.5

    ref = kernel_only(q, k, v)
    for name, kw in [
        ("v2 ones_l", {"ones_l": True}),
        ("v3 single", {"ones_l": True, "single_pass": True}),
        ("v1 plain", {}),
    ]:
        if kw.get("single_pass") and l // 1024 != l // 1024 * 1:
            continue
        try:
            got = variant_attention(q, k, v, **kw)
            err = float(
                jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
            )
            print(f"parity {name}: max|diff| = {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"parity {name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    rows = [
        ("A fwd kernel BHLD", lambda: timeit_fwd(kernel_only, q, k, v, depth=args.depth)),
        ("B fwd model path", lambda: timeit_fwd(model_path, qt, kt, vt, depth=args.depth)),
        ("v1 plain variant", lambda: timeit_fwd(variant_attention, q, k, v, depth=args.depth)),
        (
            "v2 ones_l",
            lambda: timeit_fwd(
                functools.partial(variant_attention, ones_l=True), q, k, v,
                depth=args.depth,
            ),
        ),
        (
            "v3 single+ones",
            lambda: timeit_fwd(
                functools.partial(variant_attention, ones_l=True, single_pass=True),
                q, k, v, depth=args.depth,
            ),
        ),
        ("C fwd+bwd kernel", lambda: timeit_fwdbwd(kernel_only, q, k, v)),
        ("C fwd+bwd model path", lambda: timeit_fwdbwd(model_path, qt, kt, vt)),
    ]
    for name, fn in rows:
        try:
            dt = fn()
            mult = 2.5 if "bwd" in name else 1.0
            print(
                f"{name:22s}: {dt*1e3:7.3f} ms  "
                f"{mult*cflops/dt/1e12:5.1f} TF/s counted",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
