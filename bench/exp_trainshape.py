"""Round-4 experiment: attention at the GPT-2 TRAIN shape (b8 h12 L1024 D64).

The round-3 MFU decomposition pinned attention at ~16 ms of the 70.4 ms
train step (24 TF/s fwd+bwd) and blamed "per-cell overhead" at the
single-boundary-tile geometry.  Round-4 hypothesis to test: the dominant
cost at L=1024 with (1024,1024) tiles is the causal visited/counted
ratio of 2.0 — ONE diagonal cell per bh row, half of it masked waste —
not a fixed per-cell cost.  Smaller tiles trade that waste (1.5x at
512^2, 1.25x at 256^2) against per-cell efficiency.

Measures, at depth-64 chain discipline (DESIGN.md section 6):
  * fwd block sweep at the train shape, causal
  * non-causal control (visited ratio exactly 1.0) -> pure per-cell rate
  * fwd+bwd sweep over forward blocks (bwd blocks capped at 512 anyway)

Run: python bench/exp_trainshape.py [--depth 64]

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

sys.path.insert(0, ".")
from flash_attention_tpu.kernels import BlockSizes, flash_attention  # noqa: E402


def timeit_fwd(f, q, k, v, iters=3, depth=64):
    # lax.scan compiles the body ONCE (depth-64 unrolled chains take
    # minutes to compile through the tunnel) and chains o -> q so CSE
    # cannot collapse the iterations (DESIGN.md section 6 discipline).
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
            # feed grads forward so CSE can't collapse the chain
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
    ap.add_argument("--bwd", type=int, default=1)
    args = ap.parse_args()
    b, h, l, d = map(int, args.shape.split(","))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    cflops = 4 * b * h * l * l * d * 0.5  # counted causal FLOPs
    fflops = 4 * b * h * l * l * d  # full (non-causal)

    configs = [
        (1024, 1024),
        (1024, 512),
        (512, 1024),
        (512, 512),
        (512, 256),
        (256, 512),
        (256, 256),
        (128, 256),
        (256, 128),
        (128, 128),
    ]

    print(f"== fwd causal, shape {b},{h},{l},{d}, depth {args.depth} ==", flush=True)
    for bq, bkv in configs:
        bs = BlockSizes(block_q=bq, block_kv=bkv)
        f = functools.partial(flash_attention, causal=True, block_sizes=bs)
        try:
            dt = timeit_fwd(f, q, k, v, depth=args.depth)
            # visited cells per bh row under the compact causal grid
            ni, nj = l // bq, l // bkv
            vis = sum(
                min(max(((i + 1) * bq - 1) // bkv, 0), nj - 1) + 1
                for i in range(ni)
            )
            ratio = vis * bq * bkv / (l * l / 2)
            print(
                f"bq={bq:4d} bkv={bkv:4d}: {dt*1e3:7.3f} ms  "
                f"{cflops/dt/1e12:5.1f} TF/s counted  "
                f"(visited ratio {ratio:.3f}, visited rate "
                f"{cflops*ratio/dt/1e12:5.1f})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bkv={bkv}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    print(f"== fwd NON-causal control, depth {args.depth} ==", flush=True)
    for bq, bkv in [(1024, 1024), (512, 512), (256, 256)]:
        bs = BlockSizes(block_q=bq, block_kv=bkv)
        f = functools.partial(flash_attention, causal=False, block_sizes=bs)
        try:
            dt = timeit_fwd(f, q, k, v, depth=args.depth)
            print(
                f"bq={bq:4d} bkv={bkv:4d}: {dt*1e3:7.3f} ms  "
                f"{fflops/dt/1e12:5.1f} TF/s (visited == counted)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bkv={bkv}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    if args.bwd:
        print("== fwd+bwd causal (2.5x convention), depth 24 ==", flush=True)
        for bq, bkv in [(1024, 1024), (512, 512), (256, 256), (256, 512)]:
            bs = BlockSizes(block_q=bq, block_kv=bkv)
            f = functools.partial(flash_attention, causal=True, block_sizes=bs)
            try:
                dt = timeit_fwdbwd(f, q, k, v, depth=24)
                print(
                    f"bq={bq:4d} bkv={bkv:4d}: {dt*1e3:7.3f} ms  "
                    f"{2.5*cflops/dt/1e12:5.1f} TF/s",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq} bkv={bkv}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
