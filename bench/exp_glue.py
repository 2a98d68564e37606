"""Round-4 experiment: elementwise-glue variants of the GPT-2 train step.

Same-session, interleaved in-step A/B (the only measurement this tunnel
respects — substitution deltas from different sessions are noise):

  base      : shipped model
  ln1pass   : layernorm variance via E[x^2] - mu^2 (one reduction pass
              instead of mean-then-squared-deviation's two)
  geluvjp   : gelu with a custom_vjp that saves t = tanh(u), making the
              backward pure arithmetic (XLA otherwise recomputes tanh);
              the risk is breaking XLA's matmul-epilogue fusion
  base2     : baseline repeated last to bound session drift

Run: python bench/exp_glue.py

NOTE (post round 4): utils/measure.py (chain_timer / ab_compare) is the
canonical timing protocol — sync-per-iteration best-of-N with an
interleaved drift band.  The local harness below predates it (it queues
iterations and syncs once, a mean) and is kept verbatim because the
recorded CONCLUSION numbers were produced with it; use utils.measure
for NEW measurements.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_attention_tpu.models import gpt  # noqa: E402
from flash_attention_tpu.training import make_optimizer, make_train_step  # noqa: E402


def time_step(step, params, opt_state, idx, rng, steps=8, iters=5):
    @jax.jit
    def chained(params, opt_state, idx, rng):
        def body(carry, _):
            p, s = carry
            p, s, loss = step(p, s, idx, idx, rng)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps
        )
        return params, opt_state, losses[-1]

    p, o, loss = chained(params, opt_state, idx, rng)
    float(loss)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        p, o, loss = chained(params, opt_state, idx, rng)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def _layer_norm_1pass(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    ex2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = ex2 - mu * mu
    y = (x32 - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


@jax.custom_vjp
def _gelu_saved_tanh(x):
    u = _C * (x + _A * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * x * (1.0 + t)


def _gelu_fwd(x):
    u = _C * (x + _A * x * x * x)
    t = jnp.tanh(u)
    return 0.5 * x * (1.0 + t), (x, t)


def _gelu_bwd(res, g):
    x, t = res
    du = _C * (1.0 + 3.0 * _A * x * x)
    dg = 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    return (g * dg,)


_gelu_saved_tanh.defvjp(_gelu_fwd, _gelu_bwd)


def main():
    cfg = gpt.GPT2_124M
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(3e-4, warmup_iters=10, lr_decay_iters=1000)
    opt_state = opt.init(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 1024), 0, cfg.vocab_size)
    rng = jax.random.PRNGKey(2)

    def run(name):
        dt = time_step(make_train_step(cfg, opt), params, opt_state, idx, rng)
        print(f"{name:10s}: {dt*1e3:7.2f} ms/step  ({8192/dt:,.0f} tok/s)", flush=True)
        return dt

    orig_ln = gpt._layer_norm
    orig_gelu = jax.nn.gelu

    run("base")

    gpt._layer_norm = _layer_norm_1pass
    try:
        run("ln1pass")
    finally:
        gpt._layer_norm = orig_ln

    jax.nn.gelu = lambda x, approximate=True: _gelu_saved_tanh(x)
    try:
        run("geluvjp")
    finally:
        jax.nn.gelu = orig_gelu

    gpt._layer_norm = _layer_norm_1pass
    jax.nn.gelu = lambda x, approximate=True: _gelu_saved_tanh(x)
    try:
        run("both")
    finally:
        gpt._layer_norm = orig_ln
        jax.nn.gelu = orig_gelu

    run("base2")


if __name__ == "__main__":
    main()
