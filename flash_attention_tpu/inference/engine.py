"""Inference engine: continuous batching over jitted prefill/decode steps.

North-star extension (BASELINE.json: "continuous batching scheduler,
TTFT/tokens-per-second measurement") — no reference analog.

Architecture: static-shape jitted steps (prefill per bucketed prompt length,
one decode step for all slots) orchestrated by a Python scheduler:

  submit(prompt) -> request queue
  step():
    1. admit queued requests into free slots (prefill, bucketed lengths)
    2. one decode step across all active slots
    3. retire finished requests (eos / max_new_tokens)

Sequences enter and leave the running batch independently — continuous
batching — while every compiled computation keeps a fixed shape (slots,
bucket sizes), the compiled-shape discipline XLA requires.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gpt import GPTConfig
from . import kv_cache as kvc
from .model_runner import decode_step, prefill
from .sampling import sample


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 = greedy
    top_k: int | None = None
    eos_id: int | None = None
    # filled by the engine
    output: list[int] = dataclasses.field(default_factory=list)
    submit_time: float = 0.0
    first_token_time: float | None = None
    finish_time: float | None = None

    @property
    def ttft(self) -> float | None:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.submit_time


def _buckets(max_len: int) -> list[int]:
    out, b = [], 64
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(max_len)
    return out


class InferenceEngine:
    """Continuous-batching engine over a GPT params pytree."""

    def __init__(
        self,
        params,
        cfg,
        *,
        slots: int = 8,
        max_len: int | None = None,
        kv_quant_dtype=None,
        rng_seed: int = 0,
        prefill_fn=None,
        decode_fn=None,
    ):
        """cfg: a GPTConfig (default architecture) or any config whose
        (n_layer, head_dim, dtype) fields exist; for non-GPT architectures
        pass `prefill_fn(params, tokens, cfg, cache, slot)` and
        `decode_fn(params, tokens, cfg, cache, active)` (e.g. the llama
        module's prefill/decode_step)."""
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len or getattr(cfg, "block_size", None) or cfg.max_seq
        kv_heads = (
            cfg.kv_heads if hasattr(cfg, "kv_heads") else cfg.n_kv_head
        )
        self.cache = kvc.init_cache(
            cfg.n_layer,
            slots,
            kv_heads,
            self.max_len,
            cfg.head_dim,
            dtype=cfg.dtype,
            quant_dtype=kv_quant_dtype,
        )
        self.buckets = _buckets(self.max_len)
        _prefill_impl = prefill_fn or prefill
        _decode_impl = decode_fn or decode_step
        self._prefill = jax.jit(
            lambda p, toks, cache, slot: _prefill_impl(p, toks, cfg, cache, slot)
        )
        self._decode = jax.jit(
            lambda p, toks, cache, active: _decode_impl(p, toks, cfg, cache, active)
        )
        self.queue: deque[Request] = deque()
        self.running: dict[int, Request] = {}  # slot -> request
        self.finished: list[Request] = []
        self._next_tokens = np.zeros((slots,), np.int32)
        self._uid = 0
        self._rng = jax.random.PRNGKey(rng_seed)
        self.stats = {"decode_steps": 0, "prefills": 0, "tokens_out": 0}

    # ------------------------------------------------------------- public API

    def submit(
        self,
        prompt: list[int],
        *,
        max_new_tokens: int = 64,
        temperature: float = 0.0,
        top_k: int | None = None,
        eos_id: int | None = None,
    ) -> int:
        if not prompt:
            raise ValueError("prompt must contain at least one token")
        self._uid += 1
        req = Request(
            uid=self._uid,
            prompt=list(prompt),
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_k=top_k,
            eos_id=eos_id,
            submit_time=time.time(),
        )
        self.queue.append(req)
        return req.uid

    def run(self, progress: Callable[[dict], None] | None = None) -> list[Request]:
        """Drive until queue + running are drained; returns finished requests."""
        while self.queue or self.running:
            self.step()
            if progress:
                progress(self.stats)
        return self.finished

    def step(self) -> None:
        self._admit()
        if self.running:
            self._decode_all()

    # ---------------------------------------------------------------- private

    def _bucket_len(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max_len {self.max_len}")

    def _admit(self) -> None:
        free = [s for s in range(self.slots) if s not in self.running]
        while free and self.queue:
            slot = free.pop(0)
            req = self.queue.popleft()
            n = len(req.prompt)
            if n >= self.max_len:
                req.prompt = req.prompt[-(self.max_len - 1) :]
                n = len(req.prompt)
            bucket = self._bucket_len(n)
            toks = np.zeros((bucket,), np.int32)
            toks[:n] = req.prompt
            # Right-pad with the last token: padded tail is truncated below by
            # setting length = n afterwards.
            toks[n:] = req.prompt[-1]
            cache, logits = self._prefill(
                self.params, jnp.asarray(toks), self.cache, jnp.int32(slot)
            )
            if bucket != n:
                # the logits we want are at position n-1; redo cheaply by
                # re-picking from the full prefill using exact length
                cache = kvc.set_length(cache, jnp.int32(slot), n)
                # bucket-padded prefill computed last-position logits; for
                # padded prompts run one decode-style correction instead:
                logits = None
            self.cache = cache
            tok = (
                self._sample_one(logits, req) if logits is not None else None
            )
            if tok is None:
                # exact last-token logits via one decode step on this slot:
                # feed the true last prompt token at position n-1.
                self.cache = kvc.set_length(
                    self.cache, jnp.int32(slot), n - 1
                )
                toks_all = np.array(self._next_tokens)
                toks_all[slot] = req.prompt[-1]
                active = np.zeros((self.slots,), bool)
                active[slot] = True
                self.cache, logits_all = self._decode(
                    self.params,
                    jnp.asarray(toks_all),
                    self.cache,
                    jnp.asarray(active),
                )
                tok = self._sample_one(logits_all[slot], req)
            req.first_token_time = time.time()
            req.output.append(int(tok))
            self._next_tokens[slot] = int(tok)
            self.stats["prefills"] += 1
            self.stats["tokens_out"] += 1
            if (req.eos_id is not None and int(tok) == req.eos_id) or (
                req.max_new_tokens <= 1
            ):
                req.finish_time = time.time()
                self.finished.append(req)
                free.insert(0, slot)
            else:
                self.running[slot] = req

    def _sample_one(self, logits: jax.Array, req: Request) -> int:
        self._rng, sub = jax.random.split(self._rng)
        return int(
            sample(
                logits[None],
                sub,
                temperature=req.temperature,
                top_k=req.top_k,
            )[0]
        )

    def _decode_all(self) -> None:
        active = np.zeros((self.slots,), bool)
        for s in self.running:
            active[s] = True
        self.cache, logits = self._decode(
            self.params,
            jnp.asarray(self._next_tokens),
            self.cache,
            jnp.asarray(active),
        )
        self.stats["decode_steps"] += 1
        done: list[int] = []
        for slot, req in self.running.items():
            self._rng, sub = jax.random.split(self._rng)
            tok = int(
                sample(
                    logits[slot][None],
                    sub,
                    temperature=req.temperature,
                    top_k=req.top_k,
                )[0]
            )
            req.output.append(tok)
            self._next_tokens[slot] = tok
            self.stats["tokens_out"] += 1
            hit_eos = req.eos_id is not None and tok == req.eos_id
            cache_full = len(req.prompt) + len(req.output) >= self.max_len
            if len(req.output) >= req.max_new_tokens or hit_eos or cache_full:
                req.finish_time = time.time()
                self.finished.append(req)
                done.append(slot)
        for slot in done:
            del self.running[slot]
