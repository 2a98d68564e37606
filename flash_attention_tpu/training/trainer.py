"""Training steps and loop: the reference demo trainer, TPU-native.

/root/reference/demo/train.py drives PopTorch `trainingModel`/`inferenceModel`
with replication (data parallelism), gradient accumulation, and periodic eval
(…:212-265).  Here the same roles are:

* `train_step` — one jitted fwd+bwd+update; data parallelism comes from
  sharding the batch over a mesh "data" axis (PopTorch replicationFactor
  analog, …:214), with XLA inserting the gradient all-reduce over ICI.
* gradient accumulation — `optax.MultiSteps` (PopTorch
  Training.gradientAccumulation analog, …:219).
* `Trainer` — eval cadence + loss bookkeeping (…:229-265).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from ..models import gpt
from .optimizer import make_optimizer


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def _default_loss(cfg):
    """(params, idx, targets, rng, train) -> scalar loss for `cfg`'s model
    family — GPTConfig uses the dropout-aware gpt loss; LlamaConfig the
    llama one (no dropout in the architecture)."""
    from ..models import llama

    if isinstance(cfg, llama.LlamaConfig):
        return lambda p, i, t, rng, train: llama.loss_fn(p, i, t, cfg)
    return lambda p, i, t, rng, train: gpt.loss_fn(
        p, i, t, cfg, rng=rng if train else None, deterministic=not train
    )


def make_train_step(
    cfg, optimizer: optax.GradientTransformation, loss: Callable | None = None
) -> Callable:
    """Build a jittable (state, batch, rng) -> (state, loss) step.

    `loss(params, idx, targets, rng, train)` overrides the model-family
    default (custom objectives, auxiliary losses, other model families).
    """
    loss = loss or _default_loss(cfg)

    def train_step(params, opt_state, idx, targets, rng):
        loss_v, grads = jax.value_and_grad(
            lambda p: loss(p, idx, targets, rng, True)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_v

    return train_step


def make_eval_step(cfg, loss: Callable | None = None) -> Callable:
    loss = loss or _default_loss(cfg)

    def eval_step(params, idx, targets):
        return loss(params, idx, targets, None, False)

    return eval_step


@dataclasses.dataclass
class TrainerConfig:
    """Knobs mirroring the reference's DEFAULT_CONFIGS (demo/train.py:32-38)."""

    max_iters: int = 2000
    eval_interval: int = 250
    eval_iters: int = 20
    learning_rate: float = 3e-4
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    warmup_iters: int = 100
    lr_decay_iters: int | None = None  # default: max_iters
    gradient_accumulation: int = 1
    log_interval: int = 50
    # Periodic checkpointing + resume (the reference has neither — SURVEY §5):
    # every `checkpoint_every` iters (and at the end) the full training state
    # (params, opt_state, step, rng) is saved to `checkpoint_dir/step_N`.
    checkpoint_every: int = 0
    checkpoint_dir: str | None = None
    # Measured on-chip block-size tuning (kernels/autotune.py): before the
    # first train step is traced, sweep the model's attention shape on the
    # live backend and cache the winning tiling; flash_attention's
    # default-blocks path then uses it.  One sweep per (shape, chip kind),
    # persisted — later runs hit the cache and pay nothing.
    autotune_blocks: bool = False


class Trainer:
    """Single-host training loop with periodic eval (demo/train.py:229-265).

    Data parallelism: pass a `jax.sharding.NamedSharding` for the batch via
    `batch_sharding` and params replicated/sharded via `param_sharding`; jit
    then partitions the step (the PopTorch replication analog).
    """

    def __init__(
        self,
        cfg,
        tcfg: TrainerConfig,
        *,
        params=None,
        seed: int = 0,
        param_sharding=None,
        batch_sharding=None,
    ):
        """cfg: a GPTConfig or LlamaConfig (model family dispatched by
        type; params initialized accordingly unless given)."""
        from ..models import llama

        self.cfg = cfg
        self.tcfg = tcfg
        key = jax.random.PRNGKey(seed)
        self.init_key, self.rng = jax.random.split(key)
        if params is None:
            init = (
                llama.init_params
                if isinstance(cfg, llama.LlamaConfig)
                else gpt.init_params
            )
            params = init(self.init_key, cfg)
        self.params = params
        opt = make_optimizer(
            tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            grad_clip=tcfg.grad_clip,
            warmup_iters=tcfg.warmup_iters,
            lr_decay_iters=tcfg.lr_decay_iters or tcfg.max_iters,
        )
        if tcfg.gradient_accumulation > 1:
            opt = optax.MultiSteps(opt, tcfg.gradient_accumulation)
        self.optimizer = opt
        self.opt_state = opt.init(self.params)
        in_shardings = None
        if param_sharding is not None or batch_sharding is not None:
            in_shardings = (
                param_sharding,
                None,
                batch_sharding,
                batch_sharding,
                None,
            )
        self._train_step = jax.jit(
            make_train_step(cfg, opt), in_shardings=in_shardings
        )
        self._eval_step = jax.jit(make_eval_step(cfg))
        self.history: list[dict] = []
        self.step = 0

    # -- checkpoint / resume ------------------------------------------------

    def _ckpt_state(self) -> dict:
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            "rng": self.rng,
        }

    def save(self, root: str | None = None) -> str:
        """Save full training state to ``root/step_{step}``; returns the path."""
        import pathlib

        from .checkpoint import save_checkpoint

        root = root or self.tcfg.checkpoint_dir
        if root is None:
            raise ValueError("no checkpoint dir: pass root= or set tcfg.checkpoint_dir")
        path = pathlib.Path(root).resolve() / f"step_{self.step}"
        save_checkpoint(path, self._ckpt_state())
        return str(path)

    def resume(self, root: str | None = None) -> int | None:
        """Restore from the latest ``step_*`` checkpoint under root.

        Returns the restored step (training continues from there: ``fit``
        starts at ``self.step``, and the optax schedule picks up from the
        restored opt_state's internal count) or None if no checkpoint exists.
        """
        from .checkpoint import latest_step_dir, restore_checkpoint

        root = root or self.tcfg.checkpoint_dir
        if root is None:
            raise ValueError("no checkpoint dir: pass root= or set tcfg.checkpoint_dir")
        path = latest_step_dir(root)
        if path is None:
            return None
        state = restore_checkpoint(path, like=self._ckpt_state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        self.rng = jnp.asarray(state["rng"])
        return self.step

    def fit(
        self,
        train_batches: Iterator,
        *,
        val_batches: Callable[[], Iterator] | None = None,
        log: Callable[[str], None] = print,
        metrics=None,
    ) -> list[dict]:
        """metrics: optional training.metrics.MetricsLogger (JSONL/wandb).

        Exceptions are recorded to the metrics summary before re-raising
        (the reference logs failures to wandb.summary, demo/train.py:275-279).
        """
        try:
            return self._fit(train_batches, val_batches, log, metrics)
        except Exception as exc:
            if metrics is not None:
                metrics.summary({"error": repr(exc)})
            # Crash-safe training: if checkpointing is configured, save the
            # full state at the failure point so `resume()` can continue
            # from the crash instead of the last periodic checkpoint.
            # (Failure-handling extension — the reference only swallows the
            # exception into its wandb summary, demo/train.py:275-279.)
            if self.tcfg.checkpoint_dir is not None:
                try:
                    path = self.save()
                    log(f"emergency checkpoint after {exc!r}: {path}")
                except Exception as save_exc:  # noqa: BLE001
                    log(f"emergency checkpoint FAILED: {save_exc!r}")
            raise

    def warmup_autotune(self, batch_size: int, seq_len: int | None = None):
        """Measure the best attention tiling for this model's train shape
        on the live backend and cache it (kernels/autotune.py) so the
        jitted train step's flash_attention picks it up.  Call before the
        first step (fit() does this when tcfg.autotune_blocks is set)."""
        from ..kernels.autotune import autotune_for_model

        return autotune_for_model(self.cfg, batch_size, seq_len=seq_len)

    def _fit(self, train_batches, val_batches, log, metrics) -> list[dict]:
        t0 = time.time()
        ckpt_every = self.tcfg.checkpoint_every
        tuned = False
        for it in range(self.step, self.tcfg.max_iters):
            idx, targets = next(train_batches)
            if self.tcfg.autotune_blocks and not tuned:
                # Before the first train-step trace: the tuned entry must
                # exist when flash_attention resolves its default blocks.
                bs = self.warmup_autotune(idx.shape[0], idx.shape[1])
                log(f"autotuned attention blocks: {bs}")
                tuned = True
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, idx, targets, sub
            )
            self.step = it + 1
            last = it == self.tcfg.max_iters - 1
            if ckpt_every and (self.step % ckpt_every == 0 or last):
                log(f"checkpoint: {self.save()}")
            do_log = it % self.tcfg.log_interval == 0 or last
            do_eval = val_batches is not None and (
                it % self.tcfg.eval_interval == 0 or last
            )
            # eval cadence is independent of log cadence: an eval hit always
            # produces a record even off the log grid.
            if do_log or do_eval:
                rec = {
                    "iter": it,
                    "train_loss": float(loss),
                    "wall_s": time.time() - t0,
                }
                if do_eval:
                    vlosses = []
                    for _, (vi, vt) in zip(
                        range(self.tcfg.eval_iters), val_batches()
                    ):
                        vlosses.append(float(self._eval_step(self.params, vi, vt)))
                    rec["val_loss"] = sum(vlosses) / max(len(vlosses), 1)
                self.history.append(rec)
                log(f"{rec}")
                if metrics is not None:
                    metrics.log(rec)
        if metrics is not None and self.history:
            metrics.summary({"final": self.history[-1]})
        return self.history
