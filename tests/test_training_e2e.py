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
