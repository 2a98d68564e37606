"""Speculative decoding: greedy spec-decode must produce OUTPUT IDENTICAL
to target-only greedy decoding, for a self-draft (always fully accepted)
and a different tiny draft (partial acceptance + rollback exercised)."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_tpu.inference import init_cache
from flash_attention_tpu.inference.model_runner import decode_loop, prefill
from flash_attention_tpu.inference.speculative import (
    gather_tokens, speculative_decode_loop,
)
from flash_attention_tpu.models import gpt

CFG = gpt.GPTConfig(
    vocab_size=64, block_size=256, n_layer=2, n_head=4, n_embd=64,
    dropout=0.0, dtype=jnp.float32,
)
DRAFT = gpt.GPTConfig(
    vocab_size=64, block_size=256, n_layer=1, n_head=2, n_embd=32,
    dropout=0.0, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


@pytest.mark.parametrize(
    "self_draft,quant",
    [(True, None), (False, None), (False, jnp.int8)],
)
def test_speculative_matches_vanilla_greedy(params, self_draft, quant):
    dcfg = CFG if self_draft else DRAFT
    dparams = params if self_draft else gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    s, k, n_iters, n_ref = 2, 3, 12, 12
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

    def prefill_both():
        ct = init_cache(
            CFG.n_layer, s, CFG.kv_heads, 256, CFG.head_dim,
            dtype=CFG.dtype, quant_dtype=quant,
        )
        cd = init_cache(dcfg.n_layer, s, dcfg.kv_heads, 256, dcfg.head_dim, dtype=dcfg.dtype)
        firsts = []
        for slot, p in enumerate(prompts):
            ct, logits = prefill(params, jnp.asarray(p, jnp.int32), CFG, ct, jnp.int32(slot))
            cd, _ = prefill(dparams, jnp.asarray(p, jnp.int32), dcfg, cd, jnp.int32(slot))
            firsts.append(int(jnp.argmax(logits)))
        return ct, cd, jnp.asarray(firsts, jnp.int32)

    ct, cd, first = prefill_both()
    ct_ref, _, _ = prefill_both()
    # reference greedy decode uses the SAME (possibly quantized) cache kind
    _, ref_toks = decode_loop(params, CFG, ct_ref, first, n_ref)

    ct2, cd2, toks, counts = jax.jit(
        lambda ct, cd, f: speculative_decode_loop(
            params, CFG, ct, dparams, dcfg, cd, f, n_iters=n_iters, k=k
        )
    )(ct, cd, first)
    for slot in range(s):
        ref = [int(x) for x in ref_toks[:, slot]]
        got = gather_tokens(toks, counts, slot, limit=n_ref)
        assert got == ref, (slot, got, ref)
    if self_draft:
        # a model drafting for itself must always fully accept
        assert int(jnp.min(counts)) == k + 1
    # caches stay aligned
    assert (ct2.lengths == cd2.lengths).all()


def test_speculative_gqa_matches_vanilla_greedy():
    """GQA target + GQA draft (group > 1 through the verify attention)."""
    cfg = gpt.GPTConfig(
        vocab_size=64, block_size=256, n_layer=2, n_head=4, n_kv_head=2,
        n_embd=64, dropout=0.0, dtype=jnp.float32,
    )
    dcfg = gpt.GPTConfig(
        vocab_size=64, block_size=256, n_layer=1, n_head=4, n_kv_head=1,
        n_embd=32, dropout=0.0, dtype=jnp.float32,
    )
    params = gpt.init_params(jax.random.PRNGKey(3), cfg)
    dparams = gpt.init_params(jax.random.PRNGKey(4), dcfg)
    s = 2
    prompts = [[3, 1, 4], [9, 2, 6, 5]]

    def prefill_both():
        ct = init_cache(cfg.n_layer, s, cfg.kv_heads, 256, cfg.head_dim, dtype=cfg.dtype)
        cd = init_cache(dcfg.n_layer, s, dcfg.kv_heads, 256, dcfg.head_dim, dtype=dcfg.dtype)
        firsts = []
        for slot, p in enumerate(prompts):
            ct, logits = prefill(params, jnp.asarray(p, jnp.int32), cfg, ct, jnp.int32(slot))
            cd, _ = prefill(dparams, jnp.asarray(p, jnp.int32), dcfg, cd, jnp.int32(slot))
            firsts.append(int(jnp.argmax(logits)))
        return ct, cd, jnp.asarray(firsts, jnp.int32)

    ct, cd, first = prefill_both()
    ct_ref, _, _ = prefill_both()
    _, ref_toks = decode_loop(params, cfg, ct_ref, first, 10)
    _, _, toks, counts = speculative_decode_loop(
        params, cfg, ct, dparams, dcfg, cd, first, n_iters=10, k=3
    )
    for slot in range(s):
        ref = [int(x) for x in ref_toks[:, slot]]
        assert gather_tokens(toks, counts, slot, limit=10) == ref


def test_speculative_bf16_smoke():
    """bf16 models: the mechanism runs, caches stay aligned, emitted tokens
    are valid ids (exact greedy equality is pinned only in fp32 — batched
    vs rank-1 bf16 reductions can legitimately break argmax near-ties)."""
    cfg = gpt.GPTConfig(
        vocab_size=64, block_size=128, n_layer=2, n_head=2, n_embd=64,
        dropout=0.0, dtype=jnp.bfloat16,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    s = 2
    ct = init_cache(cfg.n_layer, s, cfg.kv_heads, 128, cfg.head_dim, dtype=cfg.dtype)
    cd = init_cache(cfg.n_layer, s, cfg.kv_heads, 128, cfg.head_dim, dtype=cfg.dtype)
    first = jnp.asarray([1, 2], jnp.int32)
    ct2, cd2, toks, counts = speculative_decode_loop(
        params, cfg, ct, params, cfg, cd, first, n_iters=4, k=3
    )
    assert (ct2.lengths == cd2.lengths).all()
    assert int(counts.min()) >= 1 and int(counts.max()) <= 4
    for slot in range(s):
        got = gather_tokens(toks, counts, slot)
        assert all(0 <= t < 64 for t in got)


def test_speculative_rejects_small_draft_cache(params):
    from flash_attention_tpu.inference.speculative import (
        speculative_decode_loop as sdl,
    )

    ct = init_cache(CFG.n_layer, 1, CFG.kv_heads, 256, CFG.head_dim, dtype=CFG.dtype)
    cd = init_cache(CFG.n_layer, 1, CFG.kv_heads, 128, CFG.head_dim, dtype=CFG.dtype)
    with pytest.raises(ValueError, match="draft cache max_len"):
        sdl(params, CFG, ct, params, CFG, cd, jnp.asarray([1], jnp.int32), 2)


def test_engine_with_draft_matches_plain_engine(params):
    """The engine with a draft model attached (all-greedy workload) must
    produce the same outputs as the plain engine, while actually using the
    speculative path."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [2, 7, 1, 8, 2, 8]]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=8, **kw)
        for p in prompts:
            eng.submit(p, max_new_tokens=7)
        out = {r.uid: r.output for r in eng.run()}
        return out, eng.stats

    plain, _ = run()
    spec, stats = run(draft_params=dparams, draft_cfg=DRAFT, spec_k=3)
    assert plain == spec, (plain, spec)
    assert stats.get("spec_rounds", 0) > 0


def test_engine_draft_falls_back_for_sampled_requests(params):
    """A sampled request in the running set must route the round through
    the regular scan (speculative decoding is greedy-only)."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    eng = InferenceEngine(
        params, CFG, slots=2, max_len=256, scan_steps=4,
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3,
    )
    eng.submit([1, 2, 3], max_new_tokens=6, temperature=0.8, top_k=4)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 6
    assert eng.stats.get("spec_rounds", 0) == 0


def test_engine_mixed_batch_routes_greedy_through_draft(params):
    """Per-slot routing: a sampled request in the batch no longer disables
    speculation — greedy slots speculate every round (masked active in the
    spec loop) while the sampled slot decodes through the regular scan.
    Greedy output equality with the plain engine pins that the spec loop's
    inactive-slot masking leaves the sampled slot's cache untouched and
    vice versa; spec_rounds >> 1 pins that speculation ran THROUGH the
    mixed phase (the old all-or-nothing gate would have produced ~0 spec
    rounds here), and zero resyncs pins that the greedy slot never fell
    back to the regular scan (the ADVICE-r02 repair path is now defensive
    only)."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    greedy_prompt = [3, 1, 4, 1, 5, 9]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=4, **kw)
        uid = eng.submit(greedy_prompt, max_new_tokens=20)
        # sampled request shares the batch for most of the run
        eng.submit([7, 7, 7], max_new_tokens=12, temperature=0.9, top_k=8)
        out = {r.uid: r.output for r in eng.run()}
        return out[uid], eng.stats

    plain, _ = run()
    spec, stats = run(draft_params=dparams, draft_cfg=DRAFT, spec_k=3)
    assert stats.get("spec_rounds", 0) >= 3, stats  # ran during the mix
    assert stats.get("draft_resyncs", 0) == 0, stats  # never fell back
    assert plain == spec, (plain, spec)


def test_engine_draft_with_chunked_prefill(params):
    """Chunked admission + speculative decode compose: the draft cache gets
    one whole-prompt prefill at chunk completion and outputs still match."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompts = [list(range(1, 20)), [5, 4, 3]]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=64, scan_steps=8, **kw)
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        return {r.uid: r.output for r in eng.run()}

    plain = run()
    spec_chunked = run(
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, chunk_prefill=8
    )
    assert plain == spec_chunked


def test_engine_spec_adaptive_retreats_from_bad_draft(params):
    """spec_adaptive=True: when the acceptance EMA crosses the retreat
    threshold the engine routes the rest through the regular scan — with
    outputs IDENTICAL to the plain engine (speculation is greedy-exact,
    so the guard changes throughput only).  The threshold is pinned just
    below perfect acceptance to make the retreat deterministic: the toy
    random pair happens to accept ~3/4 (tiny models loop), so its
    quality can't be relied on to trip the default threshold."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=8, **kw)
        for p in prompts:
            eng.submit(p, max_new_tokens=24)
        out = {r.uid: r.output for r in eng.run()}
        return out, eng.stats

    plain, _ = run()
    spec, stats = run(
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, spec_adaptive=True,
        spec_min_accept=3.9,
    )
    assert plain == spec, (plain, spec)
    assert "spec_disabled_at_round" in stats, stats
    # after the retreat, rounds stop accumulating
    assert stats["spec_rounds"] == stats["spec_disabled_at_round"], stats


def test_engine_spec_adaptive_resumes_pipelining_after_retreat(params):
    """Once the adaptive guard permanently retreats, no speculative round
    can interleave again, so the engine resumes pipelined scans (the
    overlapped drain draft-free engines use) instead of paying the
    synchronous loop forever — with outputs still identical to the plain
    engine."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=8, **kw)
        for p in prompts:
            eng.submit(p, max_new_tokens=40)
        out = {r.uid: r.output for r in eng.run()}
        return out, eng.stats

    plain, plain_stats = run()
    assert plain_stats.get("pipelined_scans", 0) > 0  # draft-free pipelines
    spec, stats = run(
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, spec_adaptive=True,
        spec_min_accept=3.9,
    )
    assert plain == spec, (plain, spec)
    assert "spec_disabled_at_round" in stats, stats
    assert stats.get("pipelined_scans", 0) > 0, stats
    # pre-retreat rounds stay synchronous: pipelined count < plain's
    assert stats["pipelined_scans"] <= plain_stats["pipelined_scans"], stats


def test_engine_spec_adaptive_keeps_good_draft(params):
    """A self-draft accepts everything, so the adaptive guard never
    fires and speculation runs for the whole workload."""
    from flash_attention_tpu.inference import InferenceEngine

    eng = InferenceEngine(
        params, CFG, slots=2, max_len=256, scan_steps=8,
        draft_params=params, draft_cfg=CFG, spec_k=3, spec_adaptive=True,
    )
    eng.submit([3, 1, 4, 1, 5], max_new_tokens=24)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 24
    assert "spec_disabled_at_round" not in eng.stats, eng.stats
    assert eng.stats.get("spec_rounds", 0) >= 2
    assert eng.stats["spec_accept_ema"] > 3.0, eng.stats


def test_engine_spec_retrial_reopens_when_draft_recovers(params):
    """The retreat is not a one-way door: after the adaptive guard closes
    the gate, a periodic re-trial round (spec_retrial_every) re-measures
    acceptance and re-opens once a trial clears the threshold + margin.
    The draft 'recovering' is modeled by swapping in the target's own
    params (a self-draft: perfect acceptance) after the retreat —
    supported because draft params are plain jit arguments."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), CFG)  # bad same-arch draft
    reopened = {}

    eng = InferenceEngine(
        params, CFG, slots=2, max_len=256, scan_steps=4,
        draft_params=dparams, draft_cfg=CFG, spec_k=3, spec_adaptive=True,
        spec_min_accept=3.9, spec_reopen_margin=0.0, spec_retrial_every=2,
    )

    def on_token(req, tok):
        # the instant the retreat lands, the draft "becomes good"
        if not eng._spec_enabled and "swapped" not in reopened:
            eng.draft_params = params
            reopened["swapped"] = True

    eng.submit([3, 1, 4, 1, 5], max_new_tokens=96, on_token=on_token)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 96
    stats = eng.stats
    assert "spec_disabled_at_round" in stats, stats
    assert stats.get("spec_trials", 0) >= 1, stats
    assert "spec_reopened_at_round" in stats, stats
    assert eng._spec_enabled, stats
    # post-reopen rounds kept speculating
    assert stats["spec_rounds"] > stats["spec_reopened_at_round"], stats
    # greedy-exactness end to end: identical to a plain engine
    plain = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=4)
    plain.submit([3, 1, 4, 1, 5], max_new_tokens=96)
    assert plain.run()[0].output == done[0].output


def test_engine_spec_retrial_stays_off_for_bad_draft_with_backoff(params):
    """A draft that stays bad: trials keep failing, the gate stays closed,
    and exponential backoff spaces them out (no flapping).  Outputs remain
    identical to the plain engine throughout."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompt = [3, 1, 4, 1, 5]

    def run(**kw):
        eng = InferenceEngine(
            params, CFG, slots=2, max_len=256, scan_steps=4, **kw
        )
        eng.submit(prompt, max_new_tokens=120)
        out = eng.run()[0].output
        return out, eng

    plain, _ = run()
    spec, eng = run(
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, spec_adaptive=True,
        spec_min_accept=3.9, spec_retrial_every=2,
    )
    assert plain == spec
    stats = eng.stats
    assert "spec_disabled_at_round" in stats, stats
    assert stats.get("spec_trials", 0) >= 2, stats
    assert "spec_reopened_at_round" not in stats, stats
    assert not eng._spec_enabled
    # backoff doubled the interval after each failed trial
    assert eng._spec_retrial_interval >= 2 * 2 ** (stats["spec_trials"] - 1)


def test_engine_no_draft_prefills_after_retreat(params):
    """ADVICE r4 (medium): once retreated, admissions must stop paying the
    draft prefill dispatch — the draft cache's only consumer is a future
    re-trial, which resyncs stale slots itself."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    eng = InferenceEngine(
        params, CFG, slots=2, max_len=256, scan_steps=4,
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, spec_adaptive=True,
        spec_min_accept=3.9, spec_retrial_every=0,  # permanent retreat
    )
    eng.submit([3, 1, 4, 1, 5], max_new_tokens=40)
    eng.run()
    assert "spec_disabled_at_round" in eng.stats, eng.stats
    before = eng.stats.get("draft_prefills", 0)
    for _ in range(3):  # admissions after the retreat
        eng.submit([9, 2, 6], max_new_tokens=8)
    eng.run()
    assert eng.stats.get("draft_prefills", 0) == before, eng.stats
    # and with retrials off, no trial ever fires
    assert eng.stats.get("spec_trials", 0) == 0, eng.stats


def test_engine_spec_adaptive_fast_retreat_on_catastrophic_draft(params):
    """A draft whose opening round accepts under half the crossover
    retreats IMMEDIATELY (no waiting for the EMA decay) — outputs still
    identical to the plain engine."""
    from flash_attention_tpu.inference import InferenceEngine

    dparams = gpt.init_params(jax.random.PRNGKey(9), DRAFT)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

    def run(**kw):
        eng = InferenceEngine(params, CFG, slots=2, max_len=256, scan_steps=8, **kw)
        for p in prompts:
            eng.submit(p, max_new_tokens=24)
        return {r.uid: r.output for r in eng.run()}, eng.stats

    plain, _ = run()
    # threshold set so the toy pair's ~3/4 acceptance is 'catastrophic'
    # (< 0.5 * 8): the retreat must land on the very first spec round.
    spec, stats = run(
        draft_params=dparams, draft_cfg=DRAFT, spec_k=3, spec_adaptive=True,
        spec_min_accept=8.0, spec_retrial_every=0,
    )
    assert plain == spec, (plain, spec)
    assert stats.get("spec_disabled_at_round") == 1, stats
