"""DEPRECATED METHOD — kept as the cautionary artifact (DESIGN.md §8).

Substitution-based decomposition through this tunnel is INADMISSIBLE:
its confident-looking deltas (clip 5.5 ms, gelu 4.3, layernorm 3.9)
were contradicted by controlled same-session interleaved A/Bs (fused
clip+AdamW: NEUTRAL; transposes: FREE; gelu vjp: NEUTRAL; LN one-pass:
-0.35 ms, the only survivor).  Each variant here compiles and runs in a
different tunnel phase, and session drift is several percent of the
step.  Use flash_attention_tpu.utils.measure.ab_compare instead.

Round-4 experiment: GPT-2 124M train-step decomposition by SUBSTITUTION.

The round-3 decomposition (fwd 20.9 / bwd 43.1 / AdamW 4.3 ms) split by
phase; this splits by COMPONENT, by timing the full step with one piece
at a time swapped for a near-free stand-in:

  * attention -> v passthrough        (attention fwd+bwd in-step cost)
  * layernorm -> identity             (3 fp32 LN fwd+bwd per block cost)
  * loss lse  -> mean(picked logits)  (logsumexp reduction cost)
  * gelu      -> identity             (gelu fwd+bwd cost)
  * optimizer -> sgd                  (clip+AdamW pipeline vs plain add)

Differences are attributable because everything else in the graph is
unchanged (same matmuls, same scan, same data flow).  Each variant runs
the bench_train scan-of-8 discipline.

Run: python bench/exp_trainstep.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")
from flash_attention_tpu.models import gpt  # noqa: E402
from flash_attention_tpu.training import make_optimizer, make_train_step  # noqa: E402


def time_step(step, params, opt_state, idx, rng, steps=8, iters=3):
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
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = chained(params, opt_state, idx, rng)
        float(loss)
    return (time.perf_counter() - t0) / iters / steps


def main():
    cfg = gpt.GPT2_124M
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(3e-4, warmup_iters=10, lr_decay_iters=1000)
    opt_state = opt.init(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 1024), 0, cfg.vocab_size)
    rng = jax.random.PRNGKey(2)

    results = {}

    def run(name, step):
        dt = time_step(step, params, opt_state, idx, rng)
        results[name] = dt
        print(f"{name:24s}: {dt*1e3:7.2f} ms/step  "
              f"({8*1024/dt:,.0f} tok/s)", flush=True)

    # --- baseline ---
    run("full", make_train_step(cfg, opt))

    # --- attention -> v passthrough ---
    orig_flash = gpt.flash_attention
    gpt.flash_attention = lambda q, k, v, causal=True: v
    try:
        run("attn=passthrough", make_train_step(cfg, opt))
    finally:
        gpt.flash_attention = orig_flash

    # --- layernorm -> identity (keep the affine so params still used) ---
    orig_ln = gpt._layer_norm
    gpt._layer_norm = lambda x, p, eps=1e-5: (
        x * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)
    )
    try:
        run("ln=affine-only", make_train_step(cfg, opt))
    finally:
        gpt._layer_norm = orig_ln

    # --- gelu -> identity ---
    orig_gelu = jax.nn.gelu
    import flash_attention_tpu.models.gpt as gptmod

    gptmod.jax.nn.gelu  # attr chain — patch jax.nn.gelu globally
    jax.nn.gelu = lambda x, approximate=True: x
    try:
        run("gelu=identity", make_train_step(cfg, opt))
    finally:
        jax.nn.gelu = orig_gelu

    # --- loss: lse -> mean(picked) (keeps lm_head matmul + gather) ---
    def plain_loss(p, i, t, rng_, train):
        logits = gpt.forward(p, i, cfg, rng=rng_, deterministic=not train)
        picked = jnp.take_along_axis(logits, t[..., None], axis=-1)[..., 0]
        return -jnp.mean(picked.astype(jnp.float32))

    run("loss=picked-only", make_train_step(cfg, opt, loss=plain_loss))

    # --- optimizer: full chain -> plain SGD (measures clip+adamw traffic) ---
    sgd = optax.sgd(3e-4)
    sgd_state = sgd.init(params)
    step_sgd = make_train_step(cfg, sgd)
    dt = time_step(step_sgd, params, sgd_state, idx, rng)
    results["opt=sgd"] = dt
    print(f"{'opt=sgd':24s}: {dt*1e3:7.2f} ms/step  ({8*1024/dt:,.0f} tok/s)",
          flush=True)

    # --- optimizer: adamw without clip ---
    adamw_noclip = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1)
    anc_state = adamw_noclip.init(params)
    step_anc = make_train_step(cfg, adamw_noclip)
    dt = time_step(step_anc, params, anc_state, idx, rng)
    results["opt=adamw-noclip"] = dt
    print(f"{'opt=adamw-noclip':24s}: {dt*1e3:7.2f} ms/step  "
          f"({8*1024/dt:,.0f} tok/s)", flush=True)

    full = results["full"]
    print("\n== deltas vs full ==")
    for k, v in results.items():
        if k != "full":
            print(f"{k:24s}: {(full - v)*1e3:+7.2f} ms")


if __name__ == "__main__":
    main()
