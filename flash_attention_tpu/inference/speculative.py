"""Speculative decoding: a small draft model proposes, the target verifies.

North-star serving extension (no reference analog — the reference has no
inference engine at all, SURVEY.md §5).  Greedy speculative decoding with a
draft window of k produces output identical to target-only greedy decoding
(the accept test compares the draft's tokens against the target's own
argmax at every prefix), while the target model runs once per k+1 emitted
tokens in the best case instead of once per token — the win when decode is
bound by the target's per-step weight streaming.

Exactness caveat: the verify step scores C rows in one batched forward
while decode_loop scores one row at a time; the math and scaling order are
identical (see model_runner._offset_attention) but batched-vs-rank-1
matmul reductions round differently, so in bf16 a step whose top-2 logits
are within rounding distance can pick a different (equally-ranked) token
than decode_loop would.  In fp32 the equality is exact in practice (the
test suite pins it).

TPU-native structure: the whole loop is ONE `lax.scan` dispatch — a k+1
step draft scan (the extra step writes the last draft token's KV so a
fully-accepted window leaves the draft cache consistent), one batched
`verify_step` over the k+1 candidate rows, a masked consecutive-prefix
acceptance count, and cache "rollback" expressed as a lengths update
(static shapes throughout; rows past the accepted point are garbage that
the length mask hides and later writes overwrite).  Per-slot acceptance
counts differ freely — everything is vectorized over slots.

Capacity contract: the caller must leave n_iters * (k + 1) headroom below
max_len; decode_step stops advancing at capacity, which would silently
degrade proposals near the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import kv_cache as kvc
from .model_runner import decode_step, verify_step

PAD = -1


def speculative_decode_loop(
    target_params,
    target_cfg,
    target_cache: kvc.KVCache,
    draft_params,
    draft_cfg,
    draft_cache: kvc.KVCache,
    first_tokens: jax.Array,
    n_iters: int,
    k: int = 4,
    active: jax.Array | None = None,
) -> tuple[kvc.KVCache, kvc.KVCache, jax.Array, jax.Array]:
    """Greedy speculative decoding, fully on-device.

    Preconditions: both caches hold the SAME accepted history (same prompts
    prefilled into both models), with equal `lengths`, and `first_tokens`
    [S] is the last accepted token per slot (not yet written to either
    cache — the next step writes it, exactly like `decode_loop`).  The
    draft cache must have at least the target cache's capacity (checked).

    `active` [S] bool masks which slots participate (None = all).  An
    inactive slot computes garbage (static shapes) but its cache lengths
    never advance, and every row the round writes sits at or past its
    current length — garbage rows past `lengths` are dead by the cache
    contract, so an inactive slot's real context is untouched.  This is
    what lets the engine route greedy slots through speculation while
    sampled slots decode through the regular scan in the same batch.

    Returns (target_cache, draft_cache, tokens [n_iters, S, k+1], counts
    [n_iters, S]): iteration i emitted tokens[i, s, :counts[i, s]] for
    slot s; the rest of the row is PAD.  Total emitted per slot is
    sum(counts[:, s]) — between n_iters and n_iters * (k + 1).
    """

    if draft_cache.max_len < target_cache.max_len:
        raise ValueError(
            f"draft cache max_len {draft_cache.max_len} < target "
            f"{target_cache.max_len}: the shared lengths would exceed the "
            "draft cache and silently corrupt its attention masking"
        )

    def body(carry, _):
        cache_t, cache_d, cur = carry
        s = cur.shape[0]
        l0 = cache_t.lengths  # [S]

        # Draft phase: k+1 chained draft steps starting from `cur`.  Steps
        # 1..k produce the proposals d_1..d_k; step k+1 exists only to
        # write d_k's KV into the draft cache (so a fully-accepted window
        # leaves the draft's history complete).
        def draft_body(c, _):
            cd, tok = c
            cd, logits = decode_step(draft_params, tok, draft_cfg, cd)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cd, nxt), nxt

        (cache_d, _), drafts = jax.lax.scan(
            draft_body, (cache_d, cur), None, length=k + 1
        )
        d = drafts[:k]  # [k, S] proposals

        # Verify phase: ONE target forward over [cur, d_1 .. d_k] rows.
        # Row i's logits give the target's own next token after accepting
        # the first i proposals.
        vt = jnp.concatenate([cur[None], d], axis=0).T  # [S, k+1]
        cache_t, logits_v = verify_step(target_params, vt, target_cfg, cache_t)
        t = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)  # [S, k+1]

        # Consecutive-prefix acceptance: a[s] = #{i : d_j == t_j for j<=i}.
        match = (d.T == t[:, :k]).astype(jnp.int32)  # [S, k]
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [S] in [0, k]

        # Emitted this iteration: d_1..d_a then the target's own token at
        # the first divergence (or the bonus token when all k matched).
        idx = jnp.arange(k + 1)[None, :]
        bonus = jnp.take_along_axis(t, a[:, None], axis=1)[:, 0]  # [S]
        d_pad = jnp.concatenate(
            [d.T, jnp.zeros((s, 1), jnp.int32)], axis=1
        )  # [S, k+1]
        out = jnp.where(
            idx < a[:, None],
            d_pad,
            jnp.where(idx == a[:, None], bonus[:, None], PAD),
        )

        # "Rollback" = lengths update: rows l0..l0+a hold the accepted
        # [cur, d_1..d_a] in BOTH caches (the draft wrote the same token
        # positions during its scan).  Inactive slots keep their length —
        # the rows this round scribbled sit past it and stay dead.
        new_len = jnp.minimum(l0 + a + 1, cache_t.max_len - 1)
        if active is not None:
            new_len = jnp.where(active, new_len, l0)
        cache_t = kvc.KVCache(
            cache_t.k, cache_t.v, cache_t.k_scale, cache_t.v_scale, new_len
        )
        cache_d = kvc.KVCache(
            cache_d.k, cache_d.v, cache_d.k_scale, cache_d.v_scale, new_len
        )
        return (cache_t, cache_d, bonus), (out, a + 1)

    (target_cache, draft_cache, _), (toks, counts) = jax.lax.scan(
        body, (target_cache, draft_cache, first_tokens), None, length=n_iters
    )
    return target_cache, draft_cache, toks, counts


def gather_tokens(toks, counts, slot: int, limit: int | None = None):
    """Host-side: flatten one slot's [n_iters, k+1] padded rows into the
    emitted token list (optionally truncated to `limit` tokens)."""
    import numpy as np

    toks = np.asarray(toks)[:, slot, :]
    counts = np.asarray(counts)[:, slot]
    out: list[int] = []
    for row, n in zip(toks, counts):
        out.extend(int(x) for x in row[: int(n)])
    return out if limit is None else out[:limit]
