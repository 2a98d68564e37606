"""decode_loop (scan-based on-device generation) must match the step-by-step
decode path exactly."""

import jax
import jax.numpy as jnp

from flash_attention_tpu.inference import init_cache
from flash_attention_tpu.inference.model_runner import decode_loop, decode_step, prefill
from flash_attention_tpu.models import gpt

CFG = gpt.GPTConfig(
    vocab_size=64, block_size=128, n_layer=2, n_head=2, n_embd=64,
    dropout=0.0, dtype=jnp.float32,
)


def test_decode_loop_matches_stepwise():
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG.n_layer, 2, CFG.kv_heads, 128, CFG.head_dim, dtype=CFG.dtype)
    prompt = jnp.asarray([1, 2, 3, 4], jnp.int32)
    cache, logits = prefill(params, prompt, CFG, cache, jnp.int32(0))
    cache, _ = prefill(params, prompt, CFG, cache, jnp.int32(1))
    first = jnp.full((2,), int(jnp.argmax(logits)), jnp.int32)

    # stepwise
    c1, toks1 = cache, []
    t = first
    for _ in range(5):
        c1, lg = decode_step(params, t, CFG, c1)
        t = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        toks1.append(t)
    toks1 = jnp.stack(toks1)

    # scan loop
    c2, toks2 = decode_loop(params, CFG, cache, first, 5)
    assert (toks1 == toks2).all(), (toks1, toks2)
    assert (c1.lengths == c2.lengths).all()
