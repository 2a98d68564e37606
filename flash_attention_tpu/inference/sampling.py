"""Token sampling: greedy, temperature, top-k."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(
    logits: jax.Array,
    rng: jax.Array,
    *,
    temperature: float = 0.0,
    top_k: int | None = None,
) -> jax.Array:
    """logits [batch, vocab] -> token ids [batch]."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def sample_tokens(
    logits: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
) -> jax.Array:
    """Per-slot sampling, fully traced (usable inside lax.scan).

    logits [slots, vocab]; temperature [slots] (<=0 means greedy);
    top_k [slots] int32 (vocab size disables the filter).  Each slot gets
    its own sampling config so a continuous-batching scan step can serve
    mixed requests in one dispatch.
    """
    vocab = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1)
    temp = jnp.where(temperature <= 0.0, 1.0, temperature)[:, None]
    scaled = logits / temp
    # per-slot kth threshold: sort descending, pick index top_k-1
    k = jnp.clip(top_k, 1, vocab).astype(jnp.int32)
    sorted_desc = -jnp.sort(-scaled, axis=-1)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    filtered = jnp.where(scaled < kth, -jnp.inf, scaled)
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)
