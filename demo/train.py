"""Char-level GPT training demo: the reference's nanoGPT demo, TPU-native.

Reproduces /root/reference/demo/train.py end-to-end: shakespeare-char-class
config with overrides, char tokenizer + random-crop batches, AdamW with
2D-only decay + cosine schedule, periodic eval, flash-vs-dense switch (the
OOM foil), profile mode, checkpoint/resume (which the reference lacks).

Run:  python demo/train.py --max-iters 200 --data path/to/corpus.txt
      python demo/train.py --attention dense     # the memory foil
      python demo/train.py --profile             # one traced iteration

Without --data, a deterministic synthetic corpus is generated (the
environment has no network egress; the reference downloads tiny-shakespeare).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.data import CharTokenizer, batch_iterator
from flash_attention_tpu.models import gpt
from flash_attention_tpu.training import Trainer, TrainerConfig
from flash_attention_tpu.training.checkpoint import enable_compilation_cache


def synthetic_corpus(n_chars: int = 200_000, seed: int = 0) -> str:
    """Deterministic pseudo-prose with word/sentence structure so a char LM
    has something to learn (bigram statistics, spaces, punctuation)."""
    rng = np.random.default_rng(seed)
    words = [
        "the", "of", "and", "to", "in", "attention", "is", "all", "you",
        "need", "flash", "tpu", "kernel", "memory", "chunk", "softmax",
        "query", "key", "value", "causal", "mask", "online", "block",
    ]
    out: list[str] = []
    total = 0
    while total < n_chars:
        sent_len = int(rng.integers(4, 12))
        sent = " ".join(rng.choice(words, sent_len))
        sent = sent.capitalize() + ". "
        out.append(sent)
        total += len(sent)
    return "".join(out)


def plot_losses(history: list[dict], path: pathlib.Path) -> None:
    """Train/val loss curves, the reference's wandb/matplotlib plot analog
    (/root/reference/demo/train.py:109-136; notebook cells 30-31)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    its = [r["iter"] for r in history]
    ax.plot(its, [r["train_loss"] for r in history], label="train loss")
    evals = [(r["iter"], r["val_loss"]) for r in history if "val_loss" in r]
    if evals:
        ax.plot(*zip(*evals), marker="o", label="val loss")
    ax.set_xlabel("iteration")
    ax.set_ylabel("loss")
    ax.set_ylim(bottom=0)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def train(**overrides):
    """Programmatic entry point (reference parity: train(**config_overrides),
    demo/train.py:284-321).  Returns (trainer, history)."""
    args = argparse.Namespace(**{**vars(default_args()), **overrides})
    return _run(args)


def default_args() -> argparse.Namespace:
    p = build_parser()
    return p.parse_args([])


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default=None, help="text corpus path")
    p.add_argument("--out-dir", type=str, default="out-demo")
    p.add_argument("--block-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--n-layer", type=int, default=6)
    p.add_argument("--n-head", type=int, default=6)
    p.add_argument("--n-embd", type=int, default=384)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--max-iters", type=int, default=2000)
    p.add_argument("--eval-interval", type=int, default=250)
    p.add_argument("--eval-iters", type=int, default=20)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--attention", choices=["flash", "dense"], default="flash")
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    p.add_argument(
        "--vocab-size", type=int, default=None,
        help=".bin corpora: vocab size (skips the full-mmap max() scan "
             "and covers ids absent from the data)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="checkpoint each block (trade recompute for activation memory)",
    )
    p.add_argument(
        "--cp", type=int, default=1,
        help="context parallelism: shard the sequence over this many "
             "devices and route attention through ring attention inside "
             "the model (requires block_size %% cp == 0 and cp devices; "
             "use XLA_FLAGS=--xla_force_host_platform_device_count=N "
             "JAX_PLATFORMS=cpu for a hardware-free demo)",
    )
    p.add_argument(
        "--cp-zigzag", action="store_true",
        help="with --cp: zig-zag striped sharding (causal load balance)",
    )
    p.add_argument("--profile", action="store_true", help="trace 1 iter and exit")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument(
        "--resume", action="store_true",
        help="continue from the latest step_* checkpoint under --out-dir",
    )
    p.add_argument(
        "--plot", action="store_true",
        help="also write loss_curve.png (reference demo/train.py:109-136)",
    )
    p.add_argument("--compile-cache", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def _run(args: argparse.Namespace):
    if args.compile_cache:
        enable_compilation_cache(args.compile_cache)

    if args.data and args.data.endswith(".bin"):
        # nanoGPT-style pre-tokenized uint16 corpus, memory-mapped (the
        # reference's train.bin path, demo/train.py:175-180); vocab size
        # from the data itself.  Text sampling is skipped (no tokenizer).
        from flash_attention_tpu.data import load_bin

        data = load_bin(args.data)
        tok = None
        vocab = args.vocab_size or int(data.max()) + 1
        split = int(0.9 * len(data))
        train_data, val_data = data[:split], data[split:]
        print(f"corpus: {len(data)} tokens (mmap), vocab {vocab}")
    else:
        if args.data:
            text = pathlib.Path(args.data).read_text()
        else:
            print("no --data given; using synthetic corpus")
            text = synthetic_corpus()
        tok = CharTokenizer(text)
        data = tok.encode(text)
        vocab = tok.vocab_size
        split = int(0.9 * len(data))
        train_data, val_data = data[:split], data[split:]
        print(f"corpus: {len(data)} tokens, vocab {tok.vocab_size}")

    cfg = gpt.GPTConfig(
        vocab_size=max(vocab, 8),
        block_size=args.block_size,
        n_layer=args.n_layer,
        n_head=args.n_head,
        n_embd=args.n_embd,
        dropout=args.dropout,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_flash=args.attention == "flash",
        remat=args.remat,
    )
    batch_sharding = None
    if args.cp > 1:
        import dataclasses

        import jax
        from flash_attention_tpu.parallel import make_mesh, seq_batch_sharding

        if args.block_size % args.cp:
            raise SystemExit(f"--cp {args.cp} must divide block_size")
        if len(jax.devices()) < args.cp:
            raise SystemExit(
                f"--cp {args.cp} needs {args.cp} devices, have "
                f"{len(jax.devices())} (see --cp help for the virtual-mesh env)"
            )
        cp_mesh = make_mesh(seq=args.cp)
        cfg = dataclasses.replace(
            cfg, seq_mesh=cp_mesh, seq_zigzag=args.cp_zigzag
        )
        batch_sharding = seq_batch_sharding(cp_mesh)
        print(f"context parallel: sequence sharded over {args.cp} devices"
              + (" (zigzag)" if args.cp_zigzag else ""))
    outdir = pathlib.Path(args.out_dir)
    tcfg = TrainerConfig(
        max_iters=args.max_iters,
        eval_interval=args.eval_interval,
        eval_iters=args.eval_iters,
        learning_rate=args.learning_rate,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=str(outdir) if args.checkpoint_every else None,
    )
    trainer = Trainer(cfg, tcfg, seed=args.seed, batch_sharding=batch_sharding)
    print(f"model: {gpt.num_params(trainer.params) / 1e6:.2f}M params, "
          f"attention={args.attention}")
    if args.resume:
        step = trainer.resume(str(outdir))
        if step is None:
            print(f"--resume: no step_* checkpoint under {outdir}; starting fresh")
        else:
            print(f"resumed from step {step}")

    train_iter = batch_iterator(
        train_data, args.batch_size, cfg.block_size, seed=args.seed
    )
    for _ in range(trainer.step):
        # fast-forward past the batches the pre-checkpoint run consumed so
        # the resumed run sees the same data sequence as an uninterrupted one
        next(train_iter)

    def val_batches():
        return batch_iterator(val_data, args.batch_size, cfg.block_size, seed=1234)

    if args.profile:
        from flash_attention_tpu.utils.profiling import trace

        idx, tgt = next(train_iter)
        outdir = pathlib.Path(args.out_dir) / "profile"
        outdir.mkdir(parents=True, exist_ok=True)
        # compile first so the trace captures steady-state execution
        trainer._train_step(
            trainer.params, trainer.opt_state, idx, tgt, jax.random.PRNGKey(0)
        )
        with trace(str(outdir)):
            trainer._train_step(
                trainer.params, trainer.opt_state, idx, tgt, jax.random.PRNGKey(0)
            )
        print(f"profile written to {outdir}")
        return trainer, []

    start_step = trainer.step
    t0 = time.time()
    history = trainer.fit(train_iter, val_batches=val_batches)
    wall = time.time() - t0
    tokens = (args.max_iters - start_step) * args.batch_size * cfg.block_size
    print(f"done: {wall:.1f}s, {tokens / wall:.0f} tokens/s")

    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "history.json").write_text(json.dumps(history, indent=1))
    if args.plot and history:
        plot_losses(history, outdir / "loss_curve.png")
        print(f"loss curve: {outdir / 'loss_curve.png'}")
    # sample a little text (char-tokenized corpora only; .bin corpora have
    # no tokenizer to decode with)
    if tok is not None:
        start = jnp.asarray(tok.encode(text[:8])[None, :].astype(np.int32))
        sample_ids = gpt.generate(
            trainer.params, start, cfg, max_new_tokens=100,
            temperature=0.8, top_k=20, rng=jax.random.PRNGKey(42),
        )
        print("sample:", tok.decode(np.asarray(sample_ids[0], np.uint16)))
    return trainer, history


if __name__ == "__main__":
    _run(build_parser().parse_args())
