"""Variant E2: row-per-step kernel with VMEM-resident K/V and scratch state.

Grid (bh, ni): one grid step = one whole q row-block.  K/V for the entire
sequence live in VMEM (index map constant per bh, so DMA happens once per
bh, not per cell).  The kv loop runs inside the kernel: interior blocks
(j < i) need no mask; the diagonal block is a masked epilogue.  m/l/acc are
VMEM scratch mutated in place — no fori-carry copies.

Step count: bh*ni (192 at the headline shape) vs bh*ncells (480), and the
~3us fixed per-step grid cost is the dominant term at these sizes.
"""

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


def kernel_e2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, B, d, use_mask_input=False):
    i = pl.program_id(1)
    q = q_ref[0]

    def qk(j):
        k = k_ref[0, pl.ds(j * B, B), :]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def update(s, j):
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, pl.ds(j * B, B), :]
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def loop(j, _):
        update(qk(j), j)
        return ()

    jax.lax.fori_loop(0, i, loop, ())
    # diagonal block: the only masked one
    s = qk(i)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    s = s + jnp.where(col <= row, 0.0, MASK)
    update(s, i)
    l = l_scr[:, 0:1]
    o_ref[...] = (acc_scr[...] / jnp.where(l == 0, 1.0, l)).reshape(
        o_ref.shape
    ).astype(o_ref.dtype)


def flash_e2(q, k, v, B=1024):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni = l // B
    kern = functools.partial(kernel_e2, B=B, d=d)
    return pl.pallas_call(
        kern,
        grid=(bh, ni),
        in_specs=[
            pl.BlockSpec((1, B, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, 128), jnp.float32),
            pltpu.VMEM((B, 128), jnp.float32),
            pltpu.VMEM((B, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q, k, v)


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

    from flash_attention_tpu.kernels import vanilla_attention

    ref = vanilla_attention(
        q[:2, None, :2048], k[:2, None, :2048], v[:2, None, :2048],
        causal=True, sm_scale=d**-0.5,
    )[:, 0]
    for B in (512, 1024):
        out = flash_e2(q[:2, :2048], k[:2, :2048], v[:2, :2048], B=B)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"E2 B={B}: parity err {err:.4g}", flush=True)
    for B in (1024, 512, 2048):
        try:
            f = functools.partial(flash_e2, B=B)
            dt = timeit(f, q, k, v)
            print(
                f"E2 B={B}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"E2 B={B}: FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__" and "--b2" not in sys.argv:
    main()


# --- bisect main-kernel overhead: lse output and 4D blockspecs -------------


def kernel_b2(i_tab, j_tab, *refs, bq, bkv, ncells, lse_out, four_d):
    if lse_out:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    c = pl.program_id(1)
    i, j = i_tab[c], j_tab[c]
    init = jnp.logical_or(c == 0, i_tab[jnp.maximum(c - 1, 0)] != i)
    store = jnp.logical_or(
        c == ncells - 1, i_tab[jnp.minimum(c + 1, ncells - 1)] != i
    )
    d = q_ref.shape[-1]

    @pl.when(init)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def body(masked):
        if four_d:
            q = q_ref[0].reshape(bq, d)
            k = k_ref[0]
            v = v_ref[0]
        else:
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = s + jnp.where(col <= row, 0.0, MASK)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, 0:1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
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
        l_safe = jnp.where(l == 0, 1.0, l)
        o_ref[...] = (acc_scr[...] / l_safe).reshape(o_ref.shape).astype(
            o_ref.dtype
        )
        if lse_out:
            lse = (m_scr[:, 0:1] + jnp.log2(l_safe)) * float(np.log(2.0))
            lse_ref[...] = lse.reshape(lse_ref.shape)


def flash_b2(q, k, v, bq=1024, bkv=1024, lse_out=False, four_d=False):
    bh, l, d = q.shape
    scale = d**-0.5
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ni, nj = l // bq, l // bkv
    ci, cj = [], []
    for i in range(ni):
        for j in range(0, i + 1):
            ci.append(i)
            cj.append(j)
    ci, cj = np.asarray(ci, np.int32), np.asarray(cj, np.int32)
    ncells = len(ci)
    kern = functools.partial(
        kernel_b2, bq=bq, bkv=bkv, ncells=ncells, lse_out=lse_out,
        four_d=four_d,
    )
    if four_d:
        q4 = q.reshape(bh, 1, l, d)
        in_specs = [
            pl.BlockSpec((1, 1, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0)),
            pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, bq, d), lambda b, c, it, jt: (b, 0, it[c], 0))
        ]
        out_shape = [jax.ShapeDtypeStruct((bh, 1, l, d), q.dtype)]
        lse_spec = pl.BlockSpec((1, 1, bq), lambda b, c, it, jt: (b, 0, it[c]))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, l), jnp.float32)
        ins = (q4, k, v)
    else:
        in_specs = [
            pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0)),
            pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
            pl.BlockSpec((1, bkv, d), lambda b, c, it, jt: (b, jt[c], 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, bq, d), lambda b, c, it, jt: (b, it[c], 0))
        ]
        out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
        lse_spec = pl.BlockSpec((1, bq), lambda b, c, it, jt: (b, it[c]))
        lse_shape = jax.ShapeDtypeStruct((bh, l), jnp.float32)
        ins = (q, k, v)
    if lse_out:
        out_specs.append(lse_spec)
        out_shape.append(lse_shape)
    res = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, ncells),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(ci), jnp.asarray(cj), *ins)
    o = res[0]
    return o.reshape(bh, l, d) if four_d else o


def main_b2():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5
    import itertools
    sel = sys.argv[-1]
    combos = {"00": (False, False), "10": (True, False), "01": (False, True), "11": (True, True)}
    todo = [combos[sel]] if sel in combos else list(combos.values())
    for lse_out, four_d in todo:
        print(f"compiling lse={lse_out} 4d={four_d}", flush=True)
        f = functools.partial(flash_b2, lse_out=lse_out, four_d=four_d)
        dt = timeit(f, q, k, v)
        print(
            f"B2 lse={lse_out} 4d={four_d}: {dt*1e3:.3f} ms "
            f"{flops/dt/1e12:.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__" and "--b2" in sys.argv:
    main_b2()
