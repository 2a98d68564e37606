"""Pure MXU rate probe: attention-shaped matmuls from VMEM-resident tiles.

QK-shape: (M,128)@(128,N) — contraction = head_dim = 128.
PV-shape: (M,N)@(N,128)  — contraction = kv block = N.
No HBM streaming inside the loop; measures the MXU ceiling per shape.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64


def qk_kernel(q_ref, k_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for g in range(REPS):
        s = jax.lax.dot_general(
            q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] += s[:, 128 * (g % 8):128 * (g % 8) + 128]
    o_ref[...] = acc[...]


def pv_kernel(p_ref, v_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for _ in range(REPS):
        o = jax.lax.dot(
            p_ref[...], v_ref[...], preferred_element_type=jnp.float32
        )
        acc[...] += o
    o_ref[...] = acc[...]


def run(kind, M, N, steps=8):
    if kind == "qk":
        a = jax.random.normal(jax.random.PRNGKey(0), (M, 128), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (N, 128), jnp.bfloat16)
        kern = qk_kernel
    else:
        a = jax.random.normal(jax.random.PRNGKey(0), (M, N), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (N, 128), jnp.bfloat16)
        kern = pv_kernel

    f = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(a.shape, lambda i: (0, 0)),
            pl.BlockSpec(b.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    @jax.jit
    def go(a, b):
        return jnp.sum(f(a, b))

    s = go(a, b)
    float(s)
    t0 = time.perf_counter()
    for _ in range(3):
        s = go(a, b)
    float(s)
    dt = (time.perf_counter() - t0) / 3
    fl = 2 * M * N * 128 * REPS * steps
    print(f"{kind} M={M} N={N}: {fl/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    for M, N in ((1024, 1024), (2048, 1024), (1024, 2048), (512, 512)):
        run("qk", M, N)
    for M, N in ((1024, 1024), (1024, 2048), (512, 1024)):
        run("pv", M, N)
