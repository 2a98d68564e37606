"""Llama model family tests: forward sanity, RoPE properties, cached decode
parity with full recompute, and engine integration with FP8 KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.inference import InferenceEngine, init_cache
from flash_attention_tpu.models import llama

CFG = llama.TINY_LLAMA


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params):
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, CFG.vocab_size)
    logits = llama.forward(params, idx, CFG)
    assert logits.shape == (2, 64, CFG.vocab_size)
    assert jnp.all(jnp.isfinite(logits))


def test_rope_preserves_norm_and_relativity():
    d = 64
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8, d))
    cos, sin = llama.rope_cos_sin(jnp.arange(8), d, 10000.0)
    y = llama.apply_rope(x, cos[None, None], sin[None, None])
    # rotation preserves norms
    np.testing.assert_allclose(
        jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
    )
    # dot products depend only on relative position: <R_m q, R_n k> == <R_{m+s} q, R_{n+s} k>
    q = jax.random.normal(jax.random.PRNGKey(3), (d,))
    k = jax.random.normal(jax.random.PRNGKey(4), (d,))

    def rot(v, pos):
        c, s = llama.rope_cos_sin(jnp.asarray([pos]), d, 10000.0)
        return llama.apply_rope(v[None], c, s)[0]

    a = jnp.dot(rot(q, 5), rot(k, 3))
    b = jnp.dot(rot(q, 9), rot(k, 7))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_loss_grad_finite(params):
    idx = jax.random.randint(jax.random.PRNGKey(5), (2, 32), 0, CFG.vocab_size)
    tgt = jax.random.randint(jax.random.PRNGKey(6), (2, 32), 0, CFG.vocab_size)
    loss, grads = jax.value_and_grad(llama.loss_fn)(params, idx, tgt, CFG)
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


def _greedy_ref(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = llama.forward(params, jnp.asarray([toks], jnp.int32), CFG)[0, -1]
        toks.append(int(jnp.argmax(logits)))
    return toks[len(prompt) :]


def test_cached_decode_matches_recompute(params):
    """RoPE-cached decode == full recompute (positions handled right)."""
    prompt = [1, 5, 9, 2, 7, 3, 8, 4]
    ref = _greedy_ref(params, prompt, 6)
    cache = init_cache(
        CFG.n_layer, 2, CFG.n_kv_head, 128, CFG.head_dim, dtype=CFG.dtype
    )
    cache, logits = llama.prefill(
        params, jnp.asarray(prompt, jnp.int32), CFG, cache, jnp.int32(0)
    )
    toks = [int(jnp.argmax(logits))]
    nxt = jnp.zeros((2,), jnp.int32).at[0].set(toks[0])
    active = jnp.asarray([True, False])
    for _ in range(5):
        cache, logits = llama.decode_step(params, nxt, CFG, cache, active)
        toks.append(int(jnp.argmax(logits[0])))
        nxt = nxt.at[0].set(toks[-1])
    assert toks == ref, (toks, ref)


def test_llama_engine_with_fp8_kv(params):
    """Engine drives the llama architecture with an FP8 KV cache."""
    engine = InferenceEngine(
        params,
        CFG,
        slots=2,
        max_len=128,
        kv_quant_dtype=jnp.float8_e4m3fn,
        prefill_fn=llama.prefill,
        decode_fn=llama.decode_step,
    )
    uid = engine.submit([3, 1, 4, 1, 5], max_new_tokens=4)
    fin = engine.run()
    assert len(fin) == 1 and fin[0].uid == uid
    assert len(fin[0].output) == 4
    # fp8 cache: first greedy token should match the exact reference
    ref = _greedy_ref(params, [3, 1, 4, 1, 5], 1)
    assert fin[0].output[0] == ref[0]


def test_llama_quantized_weights(params):
    """INT8/INT4 weight-only llama forward stays close to fp32."""
    from flash_attention_tpu.quant import quantize_llama_params

    idx = jax.random.randint(jax.random.PRNGKey(9), (1, 32), 0, CFG.vocab_size)
    ref = llama.forward(params, idx, CFG)
    for bits, tol in [(8, 0.05), (4, 1.0)]:
        qp = quantize_llama_params(params, bits=bits)
        out = llama.forward(qp, idx, CFG)
        assert jnp.max(jnp.abs(out - ref)) < tol, bits
        assert jnp.all(jnp.isfinite(out))


def test_llama_decode_loop_matches_stepwise(params):
    cache = init_cache(
        CFG.n_layer, 2, CFG.n_kv_head, 128, CFG.head_dim, dtype=CFG.dtype
    )
    prompt = jnp.asarray([1, 5, 9, 2], jnp.int32)
    cache, logits = llama.prefill(params, prompt, CFG, cache, jnp.int32(0))
    cache, _ = llama.prefill(params, prompt, CFG, cache, jnp.int32(1))
    first = jnp.full((2,), int(jnp.argmax(logits)), jnp.int32)

    c1, t = cache, first
    toks1 = []
    for _ in range(4):
        c1, lg = llama.decode_step(params, t, CFG, c1)
        t = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        toks1.append(t)
    c2, toks2 = llama.decode_loop(params, CFG, cache, first, 4)
    assert (jnp.stack(toks1) == toks2).all()


def test_llama_trainer_reduces_loss():
    """Trainer dispatches on config type: a LlamaConfig trains end-to-end
    (init, fused CE loss, AdamW step) and the loss goes down."""
    from flash_attention_tpu.training import Trainer, TrainerConfig

    cfg = llama.LlamaConfig(
        vocab_size=64, n_layer=2, n_head=2, n_kv_head=2, n_embd=32,
        intermediate=64, max_seq=64, dtype=jnp.float32,
    )
    tcfg = TrainerConfig(
        max_iters=8, log_interval=100, learning_rate=1e-3, warmup_iters=1
    )
    trainer = Trainer(cfg, tcfg, seed=0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 64)

    def batches():
        while True:
            yield idx, tgt

    history = trainer.fit(batches(), log=lambda s: None)
    losses = [h["train_loss"] for h in history]
    assert losses[-1] < losses[0], losses


def test_llama_chunked_prefill_engine(params):
    """Llama engine with chunked admission matches whole-prompt admission
    (prefill_chunk_fn wired through the generic engine)."""
    from flash_attention_tpu.inference import InferenceEngine

    prompts = [[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7], [2, 7, 1, 8]]

    def run(chunk):
        eng = InferenceEngine(
            params, CFG, slots=2, max_len=64, scan_steps=2,
            prefill_fn=llama.prefill,
            decode_fn=llama.decode_step,
            prefill_chunk_fn=llama.prefill_chunk,
            chunk_prefill=chunk,
        )
        for p in prompts:
            eng.submit(p, max_new_tokens=5)
        return {r.uid: r.output for r in eng.run()}

    assert run(None) == run(6)
