"""End-to-end training tests: the demo pipeline at tiny scale, flash-vs-dense
loss-curve parity (the reference notebook cell 34 experiment), and
checkpoint/resume."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "demo"))

from flash_attention_tpu.data import CharTokenizer, batch_iterator
from flash_attention_tpu.models import gpt
from flash_attention_tpu.training import Trainer, TrainerConfig
from flash_attention_tpu.training.checkpoint import restore_checkpoint, save_checkpoint


def _tiny_setup(use_flash=True, max_iters=12):
    import train as demo_train  # demo/train.py

    text = demo_train.synthetic_corpus(20_000, seed=3)
    tok = CharTokenizer(text)
    data = tok.encode(text)
    cfg = gpt.GPTConfig(
        vocab_size=max(tok.vocab_size, 8),
        block_size=128,
        n_layer=2,
        n_head=2,
        n_embd=64,
        dropout=0.0,
        dtype=jnp.float32,
        use_flash=use_flash,
    )
    tcfg = TrainerConfig(
        max_iters=max_iters, eval_interval=6, eval_iters=2, log_interval=3,
        learning_rate=1e-3, warmup_iters=2,
    )
    trainer = Trainer(cfg, tcfg, seed=0)
    batches = batch_iterator(data, 8, cfg.block_size, seed=0)
    return trainer, batches, data, cfg


def test_demo_training_loss_decreases():
    trainer, batches, data, _ = _tiny_setup()
    history = trainer.fit(batches, log=lambda s: None)
    losses = [h["train_loss"] for h in history]
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_flash_vs_dense_loss_curves_match():
    """Reference notebook cell 34: flash and standard attention produce the
    same training trajectory.  fp32 + identical seeds => near-identical."""
    t_flash, b_flash, _, _ = _tiny_setup(use_flash=True, max_iters=8)
    t_dense, b_dense, _, _ = _tiny_setup(use_flash=False, max_iters=8)
    h_flash = t_flash.fit(b_flash, log=lambda s: None)
    h_dense = t_dense.fit(b_dense, log=lambda s: None)
    for hf, hd in zip(h_flash, h_dense):
        np.testing.assert_allclose(
            hf["train_loss"], hd["train_loss"], rtol=2e-3, atol=2e-3
        )


def test_checkpoint_roundtrip(tmp_path):
    trainer, batches, _, cfg = _tiny_setup(max_iters=4)
    trainer.fit(batches, log=lambda s: None)
    state = {"params": trainer.params, "step": 4}
    path = tmp_path / "step_4"
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, like=state)
    assert restored["step"] == 4
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored params produce identical logits
    idx = jnp.zeros((1, 16), jnp.int32)
    np.testing.assert_allclose(
        gpt.forward(restored["params"], idx, cfg),
        gpt.forward(trainer.params, idx, cfg),
        atol=0,
    )


def test_resume_matches_uninterrupted(tmp_path):
    """Train 8 iters straight vs 4 + checkpoint + resume + 4: identical
    final params (resume restores params, opt_state incl. the schedule
    count, step, and rng; the test feeds the resumed run the same batch
    suffix the straight run saw)."""
    from flash_attention_tpu.data import batch_iterator

    # straight run
    t_a, batches_a, data, _ = _tiny_setup(max_iters=8)
    t_a.fit(batches_a, log=lambda s: None)

    # interrupted run: same config (same 8-iter LR schedule), stopped at 4
    t_b, batches_b, _, _ = _tiny_setup(max_iters=8)
    t_b.tcfg.max_iters = 4
    t_b.tcfg.checkpoint_every = 4
    t_b.tcfg.checkpoint_dir = str(tmp_path)
    t_b.fit(batches_b, log=lambda s: None)
    assert t_b.step == 4

    # fresh trainer resumes and continues on the same batch stream
    t_c, _, _, _ = _tiny_setup(max_iters=8)
    assert t_c.resume(str(tmp_path)) == 4
    batches_c = batch_iterator(data, 8, t_c.cfg.block_size, seed=0)
    for _ in range(4):  # skip the batches the first 4 iters consumed
        next(batches_c)
    history = t_c.fit(batches_c, log=lambda s: None)
    assert history and history[-1]["iter"] == 7
    for a, c in zip(jax.tree.leaves(t_a.params), jax.tree.leaves(t_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_emergency_checkpoint_on_crash(tmp_path):
    """A mid-training exception must leave a full-state checkpoint at the
    failure point (crash-safe training), from which resume() continues."""
    t_a, batches, data, _ = _tiny_setup(max_iters=8)
    t_a.tcfg.checkpoint_dir = str(tmp_path)

    def crashing():
        for i, b in enumerate(batches):
            if i == 3:
                raise RuntimeError("injected data failure")
            yield b

    with pytest.raises(RuntimeError, match="injected"):
        t_a.fit(crashing(), log=lambda s: None)
    assert t_a.step == 3  # three steps completed before the crash

    t_b, _, _, _ = _tiny_setup(max_iters=8)
    assert t_b.resume(str(tmp_path)) == 3
    for a, b in zip(jax.tree.leaves(t_a.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_autotune_hook(tmp_path, monkeypatch):
    """TrainerConfig(autotune_blocks=True): before the first train-step
    trace the trainer sweeps the model's attention shape and persists the
    winner; training proceeds normally on the tuned tiling."""
    import importlib

    monkeypatch.setenv("FA_AUTOTUNE_CACHE", str(tmp_path / "tune.json"))
    at = importlib.import_module("flash_attention_tpu.kernels.autotune")
    at.clear_cache()

    import train as demo_train

    text = demo_train.synthetic_corpus(10_000, seed=3)
    from flash_attention_tpu.data import CharTokenizer, batch_iterator

    tok = CharTokenizer(text)
    data = tok.encode(text)
    cfg = gpt.GPTConfig(
        vocab_size=max(tok.vocab_size, 8), block_size=128, n_layer=1,
        n_head=2, n_embd=32, dropout=0.0, dtype=jnp.float32,
    )
    tcfg = TrainerConfig(
        max_iters=2, eval_interval=10, log_interval=1, warmup_iters=1,
        autotune_blocks=True,
    )
    logs = []
    trainer = Trainer(cfg, tcfg, seed=0)
    trainer.fit(
        batch_iterator(data, 2, cfg.block_size, seed=0),
        log=logs.append,
    )
    assert any("autotuned attention blocks" in str(line) for line in logs)
    hit = at.tuned_blocks(
        (2, cfg.n_head, cfg.block_size, cfg.head_dim), cfg.block_size,
        cfg.dtype, causal=True, num_kv_heads=cfg.kv_heads,
    )
    assert hit is not None
    at.clear_cache()
