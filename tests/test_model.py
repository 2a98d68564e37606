"""Model + training tests: flash-vs-dense loss parity, the reference's
notebook cell 34 experiment (loss curves match at block 256) as a unit test,
plus optimizer grouping parity (demo/train.py:196-203)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models import gpt
from flash_attention_tpu.training import decay_mask, make_optimizer, make_train_step

TINY = gpt.GPTConfig(
    vocab_size=64,
    block_size=128,
    n_layer=2,
    n_head=2,
    n_embd=64,
    dropout=0.0,
    dtype=jnp.float32,
)


def _batch(key, cfg, b=2):
    return jax.random.randint(key, (b, cfg.block_size), 0, cfg.vocab_size)


def test_forward_shapes_and_param_count():
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    idx = _batch(jax.random.PRNGKey(1), TINY)
    logits = gpt.forward(params, idx, TINY)
    assert logits.shape == (2, TINY.block_size, TINY.vocab_size)
    assert logits.dtype == jnp.float32
    n = gpt.num_params(params)
    assert n > 0
    # shakespeare-char config is ~10.67M params (BASELINE.md nanoGPT row)
    n_char = gpt.num_params(
        gpt.init_params(jax.random.PRNGKey(0), gpt.SHAKESPEARE_CHAR)
    )
    assert 10.0e6 < n_char < 11.5e6, n_char


def test_flash_vs_dense_model_parity():
    """Same weights, flash vs dense attention: loss must match closely
    (the reference's flash-vs-standard loss-curve parity, notebook cell 34)."""
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    idx = _batch(jax.random.PRNGKey(1), TINY)
    tgt = _batch(jax.random.PRNGKey(2), TINY)
    dense_cfg = gpt.GPTConfig(**{**TINY.__dict__, "use_flash": False})
    l_flash = gpt.loss_fn(params, idx, tgt, TINY)
    l_dense = gpt.loss_fn(params, idx, tgt, dense_cfg)
    np.testing.assert_allclose(float(l_flash), float(l_dense), rtol=1e-5)

    g_flash = jax.grad(gpt.loss_fn)(params, idx, tgt, TINY)
    g_dense = jax.grad(gpt.loss_fn)(params, idx, tgt, dense_cfg)
    for pf, pd in zip(jax.tree.leaves(g_flash), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(pf, pd, atol=2e-5, rtol=1e-3)


def test_gqa_model_runs():
    cfg = gpt.GPTConfig(**{**TINY.__dict__, "n_kv_head": 1})
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = _batch(jax.random.PRNGKey(1), cfg)
    logits = gpt.forward(params, idx, cfg)
    assert jnp.all(jnp.isfinite(logits))


def test_decay_mask_grouping():
    """2-D-only weight decay grouping (demo/train.py:196-203)."""
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    mask = decay_mask(params)
    assert mask["wte"] is True
    assert mask["blocks"][0]["ln1"]["g"] is False
    assert mask["blocks"][0]["attn"]["wqkv"] is True
    assert mask["blocks"][0]["attn"]["bqkv"] is False


def test_train_step_reduces_loss():
    """A few steps on a repeated batch must reduce loss (end-to-end
    fwd+bwd+update through the flash kernel's custom_vjp)."""
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(1e-3, warmup_iters=1, lr_decay_iters=100)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(TINY, opt))
    idx = _batch(jax.random.PRNGKey(1), TINY)
    tgt = _batch(jax.random.PRNGKey(2), TINY)
    losses = []
    for it in range(8):
        params, opt_state, loss = step(
            params, opt_state, idx, tgt, jax.random.PRNGKey(it)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_generate():
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    idx = jnp.zeros((1, 4), jnp.int32)
    out = gpt.generate(
        params, idx, TINY, max_new_tokens=4, rng=jax.random.PRNGKey(3)
    )
    assert out.shape == (1, 8)
    assert (out[:, :4] == idx).all()


@pytest.mark.slow
def test_remat_grads_match_and_memory_shrinks():
    """cfg.remat=True (jax.checkpoint per block) must not change gradients
    and must wrap every block in a remat call (the byte-level memory
    assertion runs in the on-TPU lane)."""
    import dataclasses

    import numpy as np

    cfg = gpt.GPTConfig(
        vocab_size=64, block_size=128, n_layer=4, n_head=4, n_embd=128,
        dropout=0.0, dtype=jnp.float32,
    )
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 128), 0, 64)

    g_plain = jax.grad(lambda p: gpt.loss_fn(p, idx, tgt, cfg))(params)
    g_remat = jax.grad(lambda p: gpt.loss_fn(p, idx, tgt, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # Each block must trace under a remat call (the CPU backend's compiled
    # temp accounting does not reflect checkpointing, so the byte-level
    # assertion lives in the on-TPU lane — tests/tpu/test_on_device.py).
    jaxpr = str(
        jax.make_jaxpr(
            lambda p: jax.grad(lambda q: gpt.loss_fn(q, idx, tgt, cfg_r))(p)
        )(params)
    )
    assert jaxpr.count("remat") >= cfg.n_layer


def test_fused_adamw_parity():
    """fused_clip_adamw must match optax.chain(clip_by_global_norm, adamw)
    step for step — params, moments, and the clip trigger both ways
    (norm above and below the bound)."""
    params = gpt.init_params(jax.random.PRNGKey(0), TINY)
    kw = dict(warmup_iters=2, lr_decay_iters=20)
    for clip in (1.0, 1e6):  # small clip triggers scaling; huge clip doesn't
        fused = make_optimizer(1e-3, grad_clip=clip, fused=True, **kw)
        chain = make_optimizer(1e-3, grad_clip=clip, fused=False, **kw)
        pf, sf = params, fused.init(params)
        pc, sc = params, chain.init(params)
        step_f = jax.jit(make_train_step(TINY, fused))
        step_c = jax.jit(make_train_step(TINY, chain))
        idx = _batch(jax.random.PRNGKey(1), TINY)
        tgt = _batch(jax.random.PRNGKey(2), TINY)
        for it in range(4):
            rng = jax.random.PRNGKey(it)
            pf, sf, lf = step_f(pf, sf, idx, tgt, rng)
            pc, sc, lc = step_c(pc, sc, idx, tgt, rng)
        np.testing.assert_allclose(float(lf), float(lc), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pc)):
            # clip applied as g*(c/n) here vs (g/n)*c in optax: float
            # association differs at the ~1e-6 level after a few steps
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=3e-6
            )
