"""CONCLUSION (measured v5e): parity BIT-EXACT (fwd and dq), but packed
LOSES: fwd 15.5 vs 16.8 TF/s, fwd+bwd 22.5 vs 24.8.  At L=1024 every
bh-row is a single boundary tile (~8 us/cell vs 1.7 us of matmul), so
per-cell pipeline overhead — not MXU lane width — bounds D=64 attention;
the pack's XLA reshape passes only add bandwidth.  Long-context check:
LOSES there too (L=32k: 65.5 vs 68.9; L=64k: 71.1 vs 73.7) — plain D=64
at 64k already runs at ~94% of its half-lane matmul ceiling (~78 TF/s),
and the packed variant's discarded PV half caps its useful ceiling near
105 while the pack passes eat the rest.  Lane packing loses everywhere
on v5e; kept as the recorded negative.

Throwaway experiment: dual-head lane packing for D=64 attention.

GPT-2's head_dim 64 runs the kernel's d-contracted matmuls (QK^T fwd, dp
bwd) at half MXU rate (64 of 128 lanes) and measures 24 TF/s fwd+bwd at
the train shape vs 70 at D=128.  Trick, implemented ENTIRELY as XLA
reshaping around the existing kernel: pack head pair (2i, 2i+1) as one
GQA group of a d=128 call —

  K_pack[j] = [k_2i[j] | k_2i+1[j]]      (both heads share kv columns)
  q'_2i     = [q_2i | 0],  q'_2i+1 = [0 | q_2i+1]   (disjoint lane halves)

so s = q' @ K_pack^T contracts over all 128 lanes and each head's rows
see exactly its own scores (the other head's half contributes 0).  The
PV output picks lanes 0:64 for even heads, 64:128 for odd; the sliced
lanes' cotangents are zero, so gradients unpack correctly through the
kernel's custom_vjp with no new backward code.

Run: python bench/exp_d64pack.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from flash_attention_tpu.kernels import flash_attention  # noqa: E402


def packed_d64(q, k, v, *, causal=True):
    b, h, l, d = q.shape
    assert d == 64 and h % 2 == 0
    sm = float(d) ** -0.5
    kp = jnp.concatenate([k[:, 0::2], k[:, 1::2]], axis=-1)
    vp = jnp.concatenate([v[:, 0::2], v[:, 1::2]], axis=-1)
    z = jnp.zeros_like(q[:, 0::2])
    q_even = jnp.concatenate([q[:, 0::2], z], axis=-1)
    q_odd = jnp.concatenate([z, q[:, 1::2]], axis=-1)
    qp = jnp.stack([q_even, q_odd], axis=2).reshape(b, h, l, 128)
    o = flash_attention(qp, kp, vp, causal=causal, sm_scale=sm)
    o = o.reshape(b, h // 2, 2, l, 128)
    out = jnp.stack([o[:, :, 0, :, :64], o[:, :, 1, :, 64:]], axis=2)
    return out.reshape(b, h, l, d)


def main():
    b, h, l, d = 8, 12, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
    g = jax.random.normal(ks[3], (b, h, l, d), jnp.bfloat16)
    flops_fb = 2.5 * 4 * b * h * l * l * d * 0.5
    flops_f = 4 * b * h * l * l * d * 0.5

    # parity first
    o1 = flash_attention(q, k, v, causal=True)
    o2 = packed_d64(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"packed vs plain fwd max err: {err:.2e}", flush=True)
    g1 = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v).astype(jnp.float32) * g))(q)
    g2 = jax.grad(lambda q: jnp.sum(packed_d64(q, k, v).astype(jnp.float32) * g))(q)
    gerr = float(jnp.max(jnp.abs(g1.astype(jnp.float32) - g2.astype(jnp.float32))))
    print(f"packed vs plain dq  max err: {gerr:.2e}", flush=True)

    def time_fb(name, attn):
        grad_fn = jax.grad(
            lambda q, k, v: jnp.sum(attn(q, k, v).astype(jnp.float32) * g),
            argnums=(0, 1, 2))
        depth = 32

        @jax.jit
        def step(q, k, v):
            def body(q, _):
                dq, dk, dv = grad_fn(q, k, v)
                q = (q + 1e-3 * dq.astype(jnp.float32)).astype(q.dtype)
                return q, jnp.sum(dq.astype(jnp.float32))
            q, s = jax.lax.scan(body, q, None, length=depth)
            return s[-1] + jnp.sum(q.astype(jnp.float32))

        s = step(q, k, v); float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = step(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name} fwd+bwd: {dt*1e3:.3f} ms  {flops_fb/dt/1e12:.1f} TF/s",
              flush=True)

    def time_f(name, attn):
        depth = 32

        @jax.jit
        def chained(q, k, v):
            def body(q, _):
                o = attn(q, k, v)
                return (q + 0e-9 * jnp.sum(o.astype(jnp.float32))).astype(
                    q.dtype), jnp.sum(o[:1, :1, :1, :1].astype(jnp.float32))
            q, s = jax.lax.scan(body, q, None, length=depth)
            return s[-1] + jnp.sum(q.astype(jnp.float32))

        s = chained(q, k, v); float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = chained(q, k, v)
        float(s)
        dt = (time.perf_counter() - t0) / 3 / depth
        print(f"{name} fwd    : {dt*1e3:.3f} ms  {flops_f/dt/1e12:.1f} TF/s",
              flush=True)

    time_f("plain ", lambda q, k, v: flash_attention(q, k, v, causal=True))
    time_f("packed", lambda q, k, v: packed_d64(q, k, v, causal=True))
    time_fb("plain ", lambda q, k, v: flash_attention(q, k, v, causal=True))
    time_fb("packed", lambda q, k, v: packed_d64(q, k, v, causal=True))


if __name__ == "__main__":
    main()
