"""Token sampling: greedy, temperature, top-k, top-p (nucleus)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _top_p_filter(
    scaled: jax.Array, top_p: jax.Array, sorted_desc: jax.Array | None = None
) -> jax.Array:
    """Mask logits outside the nucleus: keep the smallest set of tokens
    whose cumulative probability reaches top_p [batch] (the highest-prob
    token always survives).  scaled [batch, vocab] (already /temperature);
    pass `sorted_desc` to reuse an existing descending sort (the full-vocab
    sort dominates the cost).
    """
    if sorted_desc is None:
        sorted_desc = -jnp.sort(-scaled, axis=-1)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # number of kept tokens: first index where cumsum >= p, inclusive
    keep_n = jnp.sum((cum - probs) < top_p[:, None], axis=-1)
    keep_n = jnp.clip(keep_n, 1, scaled.shape[-1])
    kth = jnp.take_along_axis(sorted_desc, (keep_n - 1)[:, None], axis=-1)
    return jnp.where(scaled < kth, -jnp.inf, scaled)


def sample(
    logits: jax.Array,
    rng: jax.Array,
    *,
    temperature: float = 0.0,
    top_k: int | None = None,
    top_p: float | None = None,
) -> jax.Array:
    """logits [batch, vocab] -> token ids [batch]."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        logits = _top_p_filter(logits, jnp.full((logits.shape[0],), top_p))
    return jax.random.categorical(rng, logits, axis=-1)


def sample_tokens(
    logits: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array | None = None,
) -> jax.Array:
    """Per-slot sampling, fully traced (usable inside lax.scan).

    logits [slots, vocab]; temperature [slots] (<=0 means greedy);
    top_k [slots] int32 (vocab size disables the filter); top_p [slots]
    f32 (1.0 disables).  Each slot gets its own sampling config so a
    continuous-batching scan step can serve mixed requests in one dispatch.
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
    if top_p is not None:
        # reuse sorted_desc with the top-k filter folded in: entries past
        # each slot's k become -inf, which sort to the tail anyway
        col = jnp.arange(vocab)[None, :]
        sorted_f = jnp.where(col < k[:, None], sorted_desc, -jnp.inf)
        filtered = _top_p_filter(
            filtered, jnp.clip(top_p, 1e-6, 1.0), sorted_desc=sorted_f
        )
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)
