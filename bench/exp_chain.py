"""CONCLUSION (measured v5e): A same-input 2.53 us/cell was XLA CSE (the
F distinct-input control runs 5.47, same as serialized B/C).  Per-JIT-
DISPATCH tunnel latency ~7-8 ms that does NOT pipeline across queued
executions is the real fixed cost (D: 24 separate dispatches = 99 ms
each); deep in-jit chains amortize it: headline 70 TF/s at depth 8 ->
101 at depth 64.  bench.py now uses depth-64 lax.scan chains.

Throwaway experiment: how much of the measured per-cell overhead is the
DEPENDENT-CHAIN timing methodology rather than the kernel?

exp_rowpipe2 accident: the same mm-only kernel measures 5.3us/cell when the
8 chained calls are serialized (o feeds the next q) and 3.0us/cell when
they are independent.  Variants (mm-only kernel, L=4096 headline shape):

  A: 8 independent calls, SAME inputs, one fetch        (CSE suspect)
  F: 8 independent calls, DISTINCT q per call           (CSE-proof)
  B: 8 serialized calls, o -> next q                    (bench.py style)
  C: 8 serialized calls, o -> next v (no extra pass)
  D: 24 separate dispatches, same args, fetch at end    (queue pipelining)

If F ~= A << B, the kernel is genuinely fast and the chained-dependent
harness overstates its cost; real model forwards interleave other kernels
between attention calls, so the independent-call number is the honest
"kernel throughput" and the chain number is a pessimistic bound.

Run: python bench/exp_chain.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from exp_rowpipe2 import run as run_mm  # noqa: E402


def main():
    b, h, l, d = 4, 12, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b * h, l, d), jnp.bfloat16) * 0.06
    qs = jax.random.normal(ks[3], (8, b * h, l, d), jnp.bfloat16) * 0.06
    k = jax.random.normal(ks[1], (b * h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b * h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * 0.5
    ncells = 48 * 10

    def report(name, dt):
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s  "
              f"{dt/ncells*1e6:.2f} us/cell", flush=True)

    def timeit(fn, *a, iters=3):
        s = fn(*a)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*a)
        float(s)
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def a_indep(q, k, v):
        s = jnp.float32(0)
        for _ in range(8):
            o = run_mm(q, k, v)
            s = s + jnp.sum(o[:1, :1, :1].astype(jnp.float32))
        return s

    @jax.jit
    def f_distinct(qs, k, v):
        s = jnp.float32(0)
        for t in range(8):
            o = run_mm(qs[t], k, v)
            s = s + jnp.sum(o[:1, :1, :1].astype(jnp.float32))
        return s

    @jax.jit
    def b_serial_q(q, k, v):
        o = q
        for _ in range(8):
            o = run_mm(o, k, v)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    @jax.jit
    def c_serial_v(q, k, v):
        o = v
        for _ in range(8):
            o = run_mm(q, k, o)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    report("A same-in ", timeit(a_indep, q, k, v) / 8)
    report("F distinct", timeit(f_distinct, qs, k, v) / 8)
    report("B ser->q  ", timeit(b_serial_q, q, k, v) / 8)
    report("C ser->v  ", timeit(c_serial_v, q, k, v) / 8)

    # D: separate dispatches, queue-pipelined, one sync at the end
    g = jax.jit(lambda q, k, v: run_mm(q, k, v))
    o = g(q, k, v)
    o.block_until_ready()
    t0 = time.perf_counter()
    outs = [g(qs[t % 8], k, v) for t in range(24)]
    s = jnp.sum(outs[-1][:1, :1, :1].astype(jnp.float32))
    float(s)
    report("D dispatch", (time.perf_counter() - t0) / 24)


if __name__ == "__main__":
    main()
