"""Sweep forward-kernel tilings at the headline shape on the real TPU.

Usage: python bench/sweep_fwd.py [--shape b,h,l,d] [--causal 1]
Prints one line per config: blocks -> ms, TFLOP/s.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_attention_tpu.kernels import BlockSizes, flash_attention  # noqa: E402


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,12,4096,128")
    ap.add_argument("--causal", type=int, default=1)
    ap.add_argument(
        "--configs",
        default=(
            "1024,1024,0;1024,1024,512;1024,1024,256;1024,1024,128;"
            "512,1024,0;512,1024,256;1024,2048,512;1024,2048,256;"
            "512,2048,512;2048,1024,256;1024,512,0;2048,2048,512"
        ),
    )
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    causal = bool(args.causal)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d * (0.5 if causal else 1.0)
    for cfg in args.configs.split(";"):
        bq, bkv, inner = map(int, cfg.split(","))
        if inner:
            print(f"bq={bq} bkv={bkv} inner={inner}: SKIP (two-level tiling removed; measured worse)")
            continue
        bs = BlockSizes(block_q=bq, block_kv=bkv)
        f = functools.partial(
            flash_attention, causal=causal, block_sizes=bs
        )
        try:
            dt = timeit(f, q, k, v)
            print(
                f"bq={bq} bkv={bkv} inner={inner or '-'}: "
                f"{dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bkv={bkv} inner={inner or '-'}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
