"""Throwaway experiment: forward-kernel VPU-reduction ideas, measured on TPU.

Variants (causal, no GQA, compact q-major cell grid, bq=bkv=1024):
  A: baseline structure (iota mask on diagonal cells, scale in kernel, exp)
  B: scale folded into q host-side + exp2 domain
  C: A + precomputed additive diagonal mask passed as input (DMA once)
  D: B + C
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


def cells(ni, nj, bq=None, bkv=None):
    if bq is None:
        bq = bkv = 1  # square-block special case: j1 = i
    ci, cj = [], []
    for i in range(ni):
        j1 = min(((i + 1) * bq - 1) // bkv, nj - 1)
        for j in range(0, j1 + 1):
            ci.append(i)
            cj.append(j)
    return np.asarray(ci, np.int32), np.asarray(cj, np.int32)


def kernel(i_tab, j_tab, *refs, bq, bkv, ncells, scale, variant):
    use_exp2 = variant in ("B", "D", "F", "G", "Y", "Z")
    use_maskin = variant in ("C", "D")
    if use_maskin:
        q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr = refs
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

    exp = jnp.exp2 if use_exp2 else jnp.exp

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if variant in ("A", "C"):
            s = s * scale
        if masked:
            if use_maskin:
                s = s + mask_ref[...].astype(jnp.float32)
            else:
                row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
                col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
                s = s + jnp.where(col <= row, 0.0, MASK)
        if variant == "Z":  # DMA+grid overhead only: no matmul at all
            acc_scr[...] = acc_scr[...] + k_ref[0, :bq, :128].astype(jnp.float32) + v_ref[0, :bq, :128].astype(jnp.float32)
            return
        if variant == "Y":  # QK only, no PV
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) if False else s
            acc_scr[...] = acc_scr[...] + s[:, :128] + v_ref[0, :bq, :128].astype(jnp.float32)
            return
        if variant == "F":  # MXU+DMA ceiling: no softmax VPU work
            p = s
            acc_scr[...] = acc_scr[...] + jax.lax.dot(
                p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
            )
            return
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = exp(m_prev - m_next)
        p = exp(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        if variant == "G":  # QK+softmax only: no PV matmul
            acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + p[:, :128]
            return
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
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l)).reshape(
            o_ref.shape
        ).astype(o_ref.dtype)


def flash(q, k, v, bq=1024, bkv=1024, variant="A"):
    bh, l, d = q.shape
    scale = d**-0.5
    if variant in ("B", "D", "F", "G", "Y", "Z"):
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, l // bkv
    ci, cj = cells(ni, nj)
    ncells = len(ci)
    use_maskin = variant in ("C", "D")
    ins = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
        pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
        pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
    ]
    if use_maskin:
        row = np.arange(bq)[:, None]
        col = np.arange(bkv)[None, :]
        maskblk = jnp.asarray(
            np.where(col <= row, 0.0, MASK), jnp.bfloat16
        )
        ins.append(maskblk)
        in_specs.append(
            pl.BlockSpec((bq, bkv), lambda b, c, it, jt: (0, 0))
        )
    kern = functools.partial(
        kernel, bq=bq, bkv=bkv, ncells=ncells, scale=scale, variant=variant
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), *ins)


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

    # parity check vs dense first (fast shape)
    from flash_attention_tpu.kernels import vanilla_attention

    qs, ks_, vs = q[:2, :1024], k[:2, :1024], v[:2, :1024]
    ref = vanilla_attention(
        qs[:, None], ks_[:, None], vs[:, None], causal=True, sm_scale=d**-0.5
    )[:, 0]
    for vnt in []:
        out = flash(qs, ks_, vs, variant=vnt)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"variant {vnt}: parity err {err:.4g}", flush=True)

    for vnt in ("Z", "Y", "F", "B"):
        f = functools.partial(flash, variant=vnt)
        dt = timeit(f, q, k, v)
        print(
            f"variant {vnt}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__" and "--base" in sys.argv:
    main()


# ---------------------------------------------------------------------------
# Variant E: KV-resident row loop with software-pipelined scores carry.
# One grid step = one whole q-row; kv blocks iterated inside the kernel with
# QK(j) issued before softmax(j-1), so MXU and VPU overlap.
# ---------------------------------------------------------------------------


def kernel_e(q_ref, k_ref, v_ref, mask_ref, o_ref, *, B, d, use_exp2=True):
    i = pl.program_id(1)
    exp = jnp.exp2 if use_exp2 else jnp.exp
    q = q_ref[0]

    def qk(j):
        k = k_ref[0, pl.ds(j * B, B), :]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def update(s, j, m, l, acc):
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = exp(m - m_next)
        p = exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, pl.ds(j * B, B), :]
        acc_next = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_next, l_next, acc_next

    m0 = jnp.full((B, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, 1), jnp.float32)
    acc0 = jnp.zeros((B, d), jnp.float32)
    s0 = qk(0)

    def loop(j, carry):
        s_prev, m, l, acc = carry
        s_cur = qk(j)  # issued before the VPU work on s_prev
        m, l, acc = update(s_prev, j - 1, m, l, acc)
        return s_cur, m, l, acc

    s_last, m, l, acc = jax.lax.fori_loop(
        1, i + 1, loop, (s0, m0, l0, acc0)
    )
    # epilogue: diagonal block i with mask
    s_last = s_last + mask_ref[...].astype(jnp.float32)
    m, l, acc = update(s_last, i, m, l, acc)
    o_ref[...] = (acc / jnp.where(l == 0, 1.0, l)).reshape(o_ref.shape).astype(
        o_ref.dtype
    )


def flash_e(q, k, v, B=512, use_exp2=True):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * (LOG2E if use_exp2 else 1.0))).astype(
        q.dtype
    )
    ni = l // B
    row = np.arange(B)[:, None]
    col = np.arange(B)[None, :]
    maskblk = jnp.asarray(np.where(col <= row, 0.0, MASK), jnp.bfloat16)
    kern = functools.partial(kernel_e, B=B, d=d, use_exp2=use_exp2)
    return pl.pallas_call(
        kern,
        grid=(bh, ni),
        in_specs=[
            pl.BlockSpec((1, B, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((B, B), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q, k, v, maskblk)


def main_e():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5

    from flash_attention_tpu.kernels import vanilla_attention

    qs, ks_, vs = q[:2, :2048], k[:2, :2048], v[:2, :2048]
    ref = vanilla_attention(
        qs[:, None], ks_[:, None], vs[:, None], causal=True, sm_scale=d**-0.5
    )[:, 0]
    for B in (512, 256):
        try:
            out = flash_e(qs, ks_, vs, B=B)
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            print(f"variant E B={B}: parity err {err:.4g}", flush=True)
        except Exception as e:
            print(f"variant E B={B}: FAIL {str(e)[:120]}", flush=True)
    for B in (512, 256, 768):
        try:
            f = functools.partial(flash_e, B=B)
            dt = timeit(f, q, k, v)
            print(
                f"variant E B={B}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"variant E B={B}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__" and "--e" in sys.argv:
    main_e()


# ---------------------------------------------------------------------------
# Variant H: K stored transposed (bh, d, L) so QK^T is a plain NN matmul.
# ---------------------------------------------------------------------------


def kernel_h(i_tab, j_tab, *refs, bq, bkv, ncells, variant):
    q_ref, kt_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr = refs
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
        q = q_ref[0]
        kt = kt_ref[0]  # (d, bkv)
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            s = s + mask_ref[...].astype(jnp.float32)
        if variant == "I":  # matmul-only ceiling
            acc_scr[...] = acc_scr[...] + jax.lax.dot(
                s.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32,
            )
            return
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
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l)).reshape(
            o_ref.shape
        ).astype(o_ref.dtype)


def flash_h(q, kt, v, bq=1024, bkv=1024, variant="H"):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, l // bkv
    ci, cj = cells(ni, nj)
    ncells = len(ci)
    row = np.arange(bq)[:, None]
    col = np.arange(bkv)[None, :]
    maskblk = jnp.asarray(np.where(col <= row, 0.0, MASK), jnp.bfloat16)
    kern = functools.partial(
        kernel_h, bq=bq, bkv=bkv, ncells=ncells, variant=variant
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
                pl.BlockSpec((1, d, bkv), lambda b, c, it, jt: (b, 0, jt[c])),
                pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
                pl.BlockSpec((bq, bkv), lambda b, c, it, jt: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), q, kt, v, maskblk)


def main_h():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    kt = jnp.swapaxes(k, 1, 2)
    flops = 4 * b * h * l * l * d * 0.5

    from flash_attention_tpu.kernels import vanilla_attention

    qs, kts, vs = q[:2, :2048], kt[:2, :, :2048], v[:2, :2048]
    ref = vanilla_attention(
        q[:2, None, :2048], k[:2, None, :2048], v[:2, None, :2048],
        causal=True, sm_scale=d**-0.5,
    )[:, 0]
    out = flash_h(qs, kts, vs)
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    print(f"variant H: parity err {err:.4g}", flush=True)
    for vnt in ("H", "I"):
        f = functools.partial(flash_h, variant=vnt)
        dt = timeit(f, q, kt, v)
        print(
            f"variant {vnt}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__" and "--h" in sys.argv:
    main_h()


# ---------------------------------------------------------------------------
# Variant M: row-split ILP — q tile processed as `split` independent row
# groups with separate m/l/acc and textually interleaved matmul/softmax ops,
# so QK(half h+1) can run on the MXU while softmax(half h) runs on the VPU.
# ---------------------------------------------------------------------------


def kernel_m(i_tab, j_tab, *refs, bq, bkv, ncells, split):
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr = refs
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
    )
    h = bq // split  # rows per group

    @pl.when(init)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(masked):
        k = k_ref[0]
        v = v_ref[0]
        # issue all QK matmuls first: independent, can overlap later VPU work
        ss = []
        for g in range(split):
            q = q_ref[0, g * h:(g + 1) * h, :]
            ss.append(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        for g in range(split):
            s = ss[g]
            if masked:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (h, bkv), 0)
                    + i * bq + g * h
                )
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (h, bkv), 1) + j * bkv
                )
                s = s + jnp.where(col <= row, 0.0, MASK)
            rows = slice(g * h, (g + 1) * h)
            m_prev = m_scr[rows, :]
            l_prev = l_scr[rows, :]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, 0:1])
            l_scr[rows, :] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[rows, :] = m_next
            acc_scr[rows, :] = acc_scr[rows, :] * alpha[:, 0:1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    crossing = (j + 1) * bkv - 1 > i * bq

    @pl.when(crossing)
    def _():
        body(True)

    @pl.when(jnp.logical_not(crossing))
    def _():
        body(False)

    @pl.when(store)
    def _():
        l = l_scr[:, 0:1]
        o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l)).reshape(
            o_ref.shape
        ).astype(o_ref.dtype)


def flash_m(q, k, v, bq=1024, bkv=1024, split=2):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, l // bkv
    ci, cj = cells(ni, nj, bq, bkv)
    ncells = len(ci)
    row = np.arange(bq)[:, None]
    col = np.arange(bkv)[None, :]
    maskblk = jnp.asarray(np.where(col <= row, 0.0, MASK), jnp.bfloat16)
    kern = functools.partial(
        kernel_m, bq=bq, bkv=bkv, ncells=ncells, split=split
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
                pl.BlockSpec((bq, bkv), lambda b, c, it, jt: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, d), lambda b, c, it, jt: (b, it[c], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), q, k, v, maskblk)


def main_m():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5

    from flash_attention_tpu.kernels import vanilla_attention

    ref = vanilla_attention(
        q[:2, None, :2048], k[:2, None, :2048], v[:2, None, :2048],
        causal=True, sm_scale=d**-0.5,
    )[:, 0]
    for split, pbq, pbkv in ((2, 1024, 1024), (2, 2048, 512), (4, 2048, 512)):
        out = flash_m(q[:2, :2048], k[:2, :2048], v[:2, :2048], split=split, bq=pbq, bkv=pbkv)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"variant M split={split} bq={pbq} bkv={pbkv}: parity err {err:.4g}", flush=True)
    for split, bq, bkv in ((2, 2048, 512), (4, 2048, 512), (2, 2048, 1024), (1, 2048, 512), (2, 4096, 512), (2, 1024, 1024)):
        try:
            f = functools.partial(flash_m, split=split, bq=bq, bkv=bkv)
            dt = timeit(f, q, k, v)
            print(
                f"variant M split={split} bq={bq} bkv={bkv}: {dt*1e3:.3f} ms "
                f"{flops/dt/1e12:.1f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"variant M split={split} bq={bq} bkv={bkv}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__" and "--m" in sys.argv:
    main_m()
