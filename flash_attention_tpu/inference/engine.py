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
from .model_runner import decode_step, prefill, prefill_chunk
from .sampling import sample, sample_tokens


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 = greedy
    top_k: int | None = None
    top_p: float | None = None  # nucleus sampling (1.0 disables)
    eos_id: int | None = None
    # streaming: called with (request, token) as tokens are accepted by the
    # scheduler (batched per decode scan, not per device step)
    on_token: Callable | None = None
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
        scan_steps: int = 8,
        scan_tokens_target: int | None = None,
        chunk_prefill: int | None = None,
        prefill_chunk_fn=None,
        draft_params=None,
        draft_cfg=None,
        spec_k: int = 4,
        spec_adaptive: bool = False,
        spec_min_accept: float | None = None,
        spec_retrial_every: int = 128,
        spec_reopen_margin: float | None = None,
        pipeline_scans: bool = True,
    ):
        """cfg: a GPTConfig (default architecture) or any config whose
        (n_layer, head_dim, dtype) fields exist; for non-GPT architectures
        pass `prefill_fn(params, tokens, cfg, cache, slot, length)` and
        `decode_fn(params, tokens, cfg, cache, active)` (e.g. the llama
        module's prefill/decode_step).

        scan_steps: decode tokens generated per dispatch.  The decode hot
        loop runs `scan_steps` steps under one lax.scan (sampling included,
        per-slot temperature/top_k), so per-token cost approaches the raw
        decode_loop kernel; the host syncs, retires finished requests, and
        admits new ones only between scans.  1 restores per-token stepping.

        scan_tokens_target: adaptive scan length by BATCH — cap each
        scan so active_slots x steps stays at or under this many tokens
        per dispatch (power-of-two steps, still bounded by scan_steps
        and the budget caps).  The round-5 capacity frontier measured
        the optimum at ~512 tokens/dispatch across batch sizes through
        the tunnel (slots8->scan32, slots16->scan32, slots32->scan16 —
        BASELINE.md); with scan_steps=32 and scan_tokens_target=512 the
        engine reproduces that frontier as the batch grows and shrinks.
        None (default) keeps the static scan_steps: the right
        tokens-per-dispatch depends on dispatch latency, which is
        environment-specific (~7-8 ms tunneled here, ~0.1 ms local).

        chunk_prefill: when set, prompts longer than this are admitted in
        chunk_prefill-token chunks interleaved with decode scans (vLLM-style
        chunked prefill), so one long prompt no longer head-of-line blocks
        every running stream.  The traced chunk start means ONE compile
        serves every chunk of every prompt.  Non-GPT architectures need a
        matching `prefill_chunk_fn(params, tokens, cfg, cache, slot, start,
        length)`.  Off by default — worth enabling only when a single
        prefill dispatch is long enough to visibly stall decode (large
        models / long prompts); at small-model scale the slot time spent
        prefilling across several scheduler steps costs more than the
        blocking it avoids (measured — see BASELINE.md).

        draft_params/draft_cfg: attach a draft model for speculative
        decoding (GPT-architecture path only).  Routing is PER SLOT:
        greedy requests decode through speculative_decode_loop (the draft
        proposes spec_k tokens, the target verifies in one forward) with
        non-greedy slots masked inactive, while sampled requests decode
        through the regular scan — a mixed batch costs two dispatches per
        round but one sampled request no longer disables speculation for
        everyone.  Greedy output is identical either way (fp32-exact; see
        speculative.py).

        spec_adaptive: measure acceptance and RETREAT when speculation is
        losing — an EMA of tokens-per-spec-iteration is kept across
        rounds, and once it falls below `spec_min_accept` (default
        0.6*(spec_k+1), the measured GPT-2-scale crossover where a spec
        iteration stops beating a regular scan step) the engine routes
        everything through the regular scan.  Greedy outputs are
        unchanged either way (speculation is exact), so the guard turns
        a badly-matched draft from a throughput LOSS (measured 1,807 vs
        4,623 tok/s with a random-weights pair) into a brief trial.
        After the retreat the engine resumes pipelined scans and stops
        paying draft prefills at admission, so it recovers draft-free
        behavior fully, not just the scan path.  Off by default: the
        mechanism tests exercise low-acceptance drafts deliberately;
        production serving should turn it on.

        spec_retrial_every: the retreat is NOT a one-way door — every
        `spec_retrial_every` regular scans the engine runs ONE
        speculative trial round (re-syncing the idle draft cache first,
        batched through prefill_many) and re-opens the gate if that
        round's mean accepted tokens clears `spec_min_accept +
        spec_reopen_margin` (hysteresis: re-opening demands a margin the
        retreat didn't, default 0.1*(spec_k+1), so a draft hovering at
        the threshold can't flap).  Each failed trial DOUBLES the wait
        before the next (exponential backoff), bounding trial overhead
        on a permanently bad draft.  The default 128 keeps trials at
        ~1% of scans for long-lived serving while short bursts see at
        most one; a trial costs the resync dispatches plus one
        speculative round (measured: per-slot resyncs at interval 32 ate
        the whole retreat win on a 1k-token workload — hence batched
        resyncs and the long default).  0 restores the permanent
        retreat."""
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
        self.scan_steps = max(1, scan_steps)
        self.scan_tokens_target = scan_tokens_target
        _prefill_impl = prefill_fn or prefill
        _decode_impl = decode_fn or decode_step
        # (No donate_argnums: fresh caches hold aliased zero buffers — JAX
        # constant-caches identical jnp.zeros — and donating the same buffer
        # twice is an error; measured no win through the axon tunnel anyway.)
        self._prefill = jax.jit(
            lambda p, toks, cache, slot, n: _prefill_impl(
                p, toks, cfg, cache, slot, n
            )
        )
        # Batched same-bucket admission (GPT path only; custom prefill_fn
        # architectures admit one prompt per dispatch).
        self._prefill_many = None
        if prefill_fn is None:
            from .model_runner import prefill_many

            self._prefill_many = jax.jit(
                lambda p, toks, cache, slots_, ns: prefill_many(
                    p, toks, cfg, cache, slots_, ns
                )
            )
        self._decode = jax.jit(
            lambda p, toks, cache, active: _decode_impl(p, toks, cfg, cache, active)
        )

        def _scan(
            p, cache, first_toks, active, rng, temps, topks, topps,
            sampling, use_top_p, steps,
        ):
            def body(carry, _):
                cache, toks, rng = carry
                cache, logits = _decode_impl(p, toks, cfg, cache, active)
                if sampling:
                    rng, sub = jax.random.split(rng)
                    nxt = sample_tokens(
                        logits, sub, temps, topks,
                        topps if use_top_p else None,
                    )
                else:
                    # all-greedy fast path: skips the full-vocab top-k sort
                    nxt = jnp.argmax(logits, axis=-1)
                return (cache, nxt.astype(jnp.int32), rng), nxt

            (cache, _, rng), toks = jax.lax.scan(
                body,
                (cache, first_toks, rng),
                None,
                length=steps,
            )
            return cache, toks, rng

        # steps is static: one compile per distinct scan length (full + the
        # shortened queue-pressure length — two in practice).
        self._decode_scan = jax.jit(_scan, static_argnums=(8, 9, 10))
        # Admission-time first tokens are sampled in ONE dispatch per
        # admission chunk: the per-request path (_sample_one) costs ~3
        # tunnel roundtrips EACH (rng split + sample dispatch + int()
        # fetch), so a full 8-wide batch admission paid ~24 roundtrips
        # for its first tokens alone.  All-greedy chunks (the common
        # serving case) skip the full-vocab sampling sort entirely.
        self._argmax_first = jax.jit(lambda logits: jnp.argmax(logits, axis=-1))
        self._sample_first = jax.jit(sample_tokens)
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.spec_k = spec_k
        self.spec_adaptive = spec_adaptive
        self.spec_min_accept = (
            spec_min_accept if spec_min_accept is not None
            else 0.6 * (spec_k + 1)
        )
        self.spec_retrial_every = max(0, spec_retrial_every)
        self.spec_reopen_margin = (
            spec_reopen_margin if spec_reopen_margin is not None
            else 0.1 * (spec_k + 1)
        )
        # Optimistic start (= perfect acceptance): the draft gets a fair
        # trial before the EMA can cross the retreat threshold.
        self._spec_accept_ema = float(spec_k + 1)
        self._spec_enabled = True
        self._scans_since_retreat = 0
        self._spec_retrial_interval = self.spec_retrial_every
        if draft_params is not None:
            if prefill_fn is not None or decode_fn is not None:
                raise ValueError(
                    "speculative decoding is wired for the GPT path only"
                )
            dkv = (
                draft_cfg.kv_heads
                if hasattr(draft_cfg, "kv_heads")
                else draft_cfg.n_kv_head
            )
            self.draft_cache = kvc.init_cache(
                draft_cfg.n_layer, slots, dkv, self.max_len,
                draft_cfg.head_dim, dtype=draft_cfg.dtype,
            )
            # Slots whose draft cache lags the target cache (they decoded
            # through the regular scan while a sampled request was running).
            # _decode_speculative re-prefills these before the spec round —
            # without this, acceptance silently collapses after any mixed
            # greedy/sampled phase (the draft would propose from garbage).
            self._draft_stale: set[int] = set()
            self._draft_prefill = jax.jit(
                lambda p, toks, cache, slot, n: prefill(
                    p, toks, draft_cfg, cache, slot, n
                )
            )
            from .model_runner import prefill_many as _pm

            self._draft_prefill_many = jax.jit(
                lambda p, toks, cache, slots_, ns: _pm(
                    p, toks, draft_cfg, cache, slots_, ns
                )
            )
            from .speculative import speculative_decode_loop

            n_spec_iters = max(1, self.scan_steps // (spec_k + 1))

            def _spec(tp, dp, ct, cd, first, active):
                return speculative_decode_loop(
                    tp, cfg, ct, dp, draft_cfg, cd, first,
                    n_iters=n_spec_iters, k=spec_k, active=active,
                )

            self._spec_scan = jax.jit(_spec)
        self.chunk_prefill = chunk_prefill
        _chunk_impl = prefill_chunk_fn or (
            prefill_chunk if prefill_fn is None else None
        )
        if chunk_prefill is not None and _chunk_impl is None:
            raise ValueError(
                "chunk_prefill with a custom prefill_fn needs prefill_chunk_fn"
            )
        if _chunk_impl is not None:
            self._prefill_chunk = jax.jit(
                lambda p, toks, cache, slot, start, n: _chunk_impl(
                    p, toks, cfg, cache, slot, start, n
                )
            )
        self.queue: deque[Request] = deque()
        self.running: dict[int, Request] = {}  # slot -> request
        self.prefilling: dict[int, list] = {}  # slot -> [request, next_pos]
        self.finished: list[Request] = []
        # Device-resident per-slot decode state: every host->device transfer
        # costs a full dispatch latency (measured ~3-5 ms each through the
        # axon tunnel), so next-tokens ride on device between scans and the
        # (active, temps, topks) config arrays are rebuilt only when the
        # running set changes.
        self._next_tokens_dev = jnp.zeros((slots,), jnp.int32)
        self._slot_cfg = None  # (active_dev, temps_dev, topks_dev, sampling)
        # In-flight decode scan awaiting its host-side drain (pipelined
        # scheduling; see step()).
        self._pending = None
        self.pipeline_scans = pipeline_scans
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
        top_p: float | None = None,
        eos_id: int | None = None,
        on_token: Callable | None = None,
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
            top_p=top_p,
            on_token=on_token,
            eos_id=eos_id,
            submit_time=time.time(),
        )
        self.queue.append(req)
        return req.uid

    def run(self, progress: Callable[[dict], None] | None = None) -> list[Request]:
        """Drive until queue + running are drained; returns finished requests."""
        while (
            self.queue or self.running or self.prefilling
            or self._pending is not None
        ):
            self.step()
            if progress:
                progress(self.stats)
        return self.finished

    def step(self) -> None:
        """One scheduler step.

        Pipelined (no draft model): dispatch the next scan FIRST — it only
        needs `toks_dev[-1]` from the previous scan, a device array, so the
        device chain never waits on the host — and THEN drain the previous
        scan's tokens: the D2H transfer and the host bookkeeping overlap
        the new scan's device time instead of serializing with it
        (measured: the synchronous loop spent ~10-15 ms of its ~45 ms scan
        cycle waiting on the D2H round trip).  The price: retirements are
        observed one scan late, so a finishing request over-generates one
        scan (surplus dropped, as with in-scan finishes) and its slot
        frees one step later.  Speculative engines keep the synchronous
        loop (per-round host routing decisions).
        """
        self._admit()
        self._advance_prefills()
        prev = self._pending
        self._pending = None
        if prev is not None and self._spec_trial_due():
            # A speculative trial round appends tokens host-side as soon as
            # it runs; the in-flight scan's tokens come chronologically
            # FIRST, so drain them before the trial can interleave (the
            # draft resync also needs req.output up to date).
            toks_dev, steps, slot_reqs = prev
            self._drain_tokens(np.asarray(toks_dev), steps, slot_reqs)
            prev = None
        if self.running:
            self._decode_all()
        if prev is not None:
            toks_dev, steps, slot_reqs = prev
            self._drain_tokens(np.asarray(toks_dev), steps, slot_reqs)

    def warmup_autotune(self, buckets: list[int] | None = None) -> None:
        """Measure the best attention tiling for the engine's whole-prompt
        prefill shapes (b=1, the engine's per-prompt geometry) on the live
        chip and cache them (kernels/autotune.py), so prefill's
        flash_attention resolves its default blocks to the measured
        winners.  One sweep per bucket per chip kind, persisted across
        processes; batched prefill_many shapes keep the hand-tuned
        defaults (their batch dim is part of the tuner's cache key).

        buckets: bucket lengths to tune; default = every admission bucket
        large enough to leave the kernel's dense-fallback regime."""
        from ..kernels.autotune import autotune_for_model
        from ..kernels.block_sizes import MIN_BLOCK

        for bucket in buckets if buckets is not None else self.buckets:
            if bucket >= MIN_BLOCK:
                autotune_for_model(self.cfg, 1, seq_len=bucket)

    def reset_stats(self) -> None:
        """Zero the stats counters (supported benchmark warmup API)."""
        self.stats = {"decode_steps": 0, "prefills": 0, "tokens_out": 0}

    def reset_spec_state(self) -> None:
        """Restore the adaptive-speculation gate to its optimistic start
        (supported benchmark warmup API: a warmup run that trips the
        retreat must not leak into the measured run)."""
        self._spec_accept_ema = float(self.spec_k + 1)
        self._spec_enabled = True
        self._scans_since_retreat = 0
        self._spec_retrial_interval = self.spec_retrial_every

    # ---------------------------------------------------------------- private

    def _bucket_len(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max_len {self.max_len}")

    def _admit(self) -> None:
        # Admission rounds repeat while requests finish on their very first
        # token and re-free their slot for the next queued prompt.
        while self._admit_round():
            pass

    def _admit_round(self) -> bool:
        """One admission round: fill free slots, BATCHING same-bucket
        prompts into one prefill dispatch (prefill_many).  Through the
        tunnel a prefill dispatch costs ~30 ms of latency regardless of
        batch size, so serial admission of a burst was ~half the engine's
        wall time at 20 req/s; batch sizes are the powers of two <= slots,
        bounding the compile count.  Returns True if a slot was re-freed
        by a request that finished on its first token."""
        free = [
            s
            for s in range(self.slots)
            if s not in self.running and s not in self.prefilling
        ]
        batch: list[tuple[int, Request, int, int]] = []
        while free and self.queue:
            slot = free.pop(0)
            req = self.queue.popleft()
            n = len(req.prompt)
            if n >= self.max_len:
                req.prompt = req.prompt[-(self.max_len - 1) :]
                n = len(req.prompt)
            if self.chunk_prefill is not None and n > self.chunk_prefill:
                # long prompt: admit incrementally, one chunk per step
                self.prefilling[slot] = [req, 0]
                continue
            batch.append((slot, req, n, self._bucket_len(n)))
        refreed = False
        groups: dict[int, list] = {}
        for item in batch:
            groups.setdefault(item[3], []).append(item)
        for bucket, items in groups.items():
            while items:
                if self._prefill_many is None:
                    m = 1
                else:
                    m = 1 << (len(items).bit_length() - 1)  # largest pow2
                chunk, items = items[:m], items[m:]
                # Right-pad with the last token; the prefill computes
                # logits at the true position n-1 and sets cache length
                # directly, so padded admissions cost one dispatch.
                toks = np.zeros((m, bucket), np.int32)
                slots_arr = np.zeros((m,), np.int32)
                lens_arr = np.zeros((m,), np.int32)
                for i, (slot, req, n, _) in enumerate(chunk):
                    toks[i, :n] = req.prompt
                    toks[i, n:] = req.prompt[-1]
                    slots_arr[i] = slot
                    lens_arr[i] = n
                if m == 1:
                    slot, req, n, _ = chunk[0]
                    self.cache, logits = self._prefill(
                        self.params,
                        jnp.asarray(toks[0]),
                        self.cache,
                        jnp.int32(slot),
                        jnp.int32(n),
                    )
                    logits = logits[None]
                else:
                    self.cache, logits = self._prefill_many(
                        self.params,
                        jnp.asarray(toks),
                        self.cache,
                        jnp.asarray(slots_arr),
                        jnp.asarray(lens_arr),
                    )
                if self.draft_params is not None and self._spec_enabled:
                    if m == 1:
                        self.draft_cache, _ = self._draft_prefill(
                            self.draft_params,
                            jnp.asarray(toks[0]),
                            self.draft_cache,
                            jnp.int32(chunk[0][0]),
                            jnp.int32(chunk[0][2]),
                        )
                    else:
                        self.draft_cache, _ = self._draft_prefill_many(
                            self.draft_params,
                            jnp.asarray(toks),
                            self.draft_cache,
                            jnp.asarray(slots_arr),
                            jnp.asarray(lens_arr),
                        )
                    self.stats["draft_prefills"] = (
                        self.stats.get("draft_prefills", 0) + 1
                    )
                    for slot, *_ in chunk:
                        self._draft_stale.discard(slot)
                elif self.draft_params is not None:
                    # Retreated: the only consumer of the draft cache is a
                    # future re-trial round, which resyncs stale slots
                    # itself — skip the per-admission draft dispatch.
                    self._draft_stale.update(s for s, *_ in chunk)
                first_dev, first_host = self._first_tokens(
                    [it[1] for it in chunk], logits
                )
                # one batched carry update (a per-slot .at[].set costs a
                # dispatch each); immediately-finished slots get a value
                # too, harmlessly — they are inactive until re-admitted
                self._next_tokens_dev = self._next_tokens_dev.at[
                    jnp.asarray(slots_arr)
                ].set(first_dev)
                for i, (slot, req, n, _) in enumerate(chunk):
                    if not self._finish_admission(slot, req, int(first_host[i])):
                        refreed = True  # finished on its first token
        return refreed and bool(self.queue)

    def _first_tokens(self, reqs, logits):
        """Sample every admitted request's first token in one dispatch:
        logits [m, vocab] -> (device tokens [m], host tokens [m])."""
        temps = np.array([r.temperature for r in reqs], np.float32)
        if (temps > 0.0).any():
            vocab = logits.shape[-1]
            topks = np.array(
                [r.top_k if r.top_k is not None else vocab for r in reqs],
                np.int32,
            )
            # Mirror the decode scan's use_top_p flag: when no request in
            # the chunk sets top_p, pass None so sample_tokens skips the
            # full-vocab nucleus softmax+cumsum entirely.
            use_top_p = any(
                r.top_p is not None and r.top_p < 1.0 for r in reqs
            )
            topps = (
                jnp.asarray(
                    np.array(
                        [
                            r.top_p if r.top_p is not None else 1.0
                            for r in reqs
                        ],
                        np.float32,
                    )
                )
                if use_top_p
                else None
            )
            self._rng, sub = jax.random.split(self._rng)
            toks = self._sample_first(
                logits, sub, jnp.asarray(temps), jnp.asarray(topks), topps
            )
        else:
            toks = self._argmax_first(logits)
        return toks, np.asarray(toks)

    def _resync_draft_slots(self, slots) -> None:
        """Re-prefill draft-cache slots that decoded through the regular
        scan (only the target cache advances there).

        speculative_decode_loop's precondition is equal lengths + identical
        accepted history in both caches; a lagging draft slot would propose
        from garbage and collapse acceptance.  The accepted history is
        prompt + output[:-1] (the last output token rides pending in
        _next_tokens_dev, exactly like decode_loop).  With per-slot
        routing (greedy slots ALWAYS speculate) this is defensive — a
        greedy slot no longer decodes through the regular scan — but it
        keeps the precondition locally enforced rather than assumed.
        """
        stale = sorted(self._draft_stale & set(slots))
        groups: dict[int, list] = {}
        for slot in stale:
            req = self.running[slot]
            hist = req.prompt + req.output[:-1]
            groups.setdefault(self._bucket_len(len(hist)), []).append(
                (slot, hist)
            )
        for bucket, items in groups.items():
            # Batch same-bucket resyncs through prefill_many (power-of-two
            # batch sizes — the compiles admission already pays for): a
            # re-trial round resyncing 8 slots costs 1-2 dispatches, not 8
            # (per-slot dispatches measured ~30 ms each through the
            # tunnel and ate the retreat win at short workloads).
            while items:
                m = (
                    1 << (len(items).bit_length() - 1)
                    if self._draft_prefill_many is not None
                    else 1
                )
                chunk, items = items[:m], items[m:]
                if m == 1:
                    slot, hist = chunk[0]
                    n = len(hist)
                    toks = np.full((bucket,), hist[-1], np.int32)
                    toks[:n] = hist
                    self.draft_cache, _ = self._draft_prefill(
                        self.draft_params,
                        jnp.asarray(toks),
                        self.draft_cache,
                        jnp.int32(slot),
                        jnp.int32(n),
                    )
                else:
                    toks = np.zeros((m, bucket), np.int32)
                    slots_arr = np.zeros((m,), np.int32)
                    lens_arr = np.zeros((m,), np.int32)
                    for i, (slot, hist) in enumerate(chunk):
                        n = len(hist)
                        toks[i, :n] = hist
                        toks[i, n:] = hist[-1]
                        slots_arr[i] = slot
                        lens_arr[i] = n
                    self.draft_cache, _ = self._draft_prefill_many(
                        self.draft_params,
                        jnp.asarray(toks),
                        self.draft_cache,
                        jnp.asarray(slots_arr),
                        jnp.asarray(lens_arr),
                    )
                self.stats["draft_resyncs"] = (
                    self.stats.get("draft_resyncs", 0) + len(chunk)
                )
        self._draft_stale.clear()

    def _spec_trial_due(self) -> bool:
        """True when the next decode round should be a speculative re-trial
        (retreated + spec_adaptive + the backoff interval has elapsed)."""
        return (
            self.draft_params is not None
            and self.spec_adaptive
            and not self._spec_enabled
            and self.spec_retrial_every > 0
            and self._scans_since_retreat >= self._spec_retrial_interval
        )

    def _decode_speculative(self, slots, trial: bool = False) -> None:
        """Route one decode round through the draft-verify loop for the
        given (greedy) slots.  Slots outside `slots` — empty or sampled —
        are masked inactive: they compute garbage but their cache lengths
        never advance and the rows the round scribbles sit past their
        lengths (dead by the cache contract), so sampled requests sharing
        the batch are untouched.

        trial=True: a re-trial round after an adaptive retreat.  The gate
        re-opens only if THIS round's mean accepted tokens clears
        spec_min_accept + spec_reopen_margin (hysteresis); a failed trial
        doubles the wait before the next one (backoff)."""
        from .speculative import PAD, gather_tokens

        self._resync_draft_slots(slots)
        active = np.zeros((self.slots,), bool)
        for s in slots:
            active[s] = True
        self.cache, self.draft_cache, toks_dev, counts_dev = self._spec_scan(
            self.params,
            self.draft_params,
            self.cache,
            self.draft_cache,
            self._next_tokens_dev,
            jnp.asarray(active),
        )
        toks = np.asarray(toks_dev)  # [iters, S, k+1]
        counts = np.asarray(counts_dev)  # [iters, S]
        self.stats["decode_steps"] += int(counts.shape[0]) * (self.spec_k + 1)
        self.stats["spec_rounds"] = self.stats.get("spec_rounds", 0) + 1
        if trial:
            got = counts[:, list(slots)]
            round_mean = float(got.mean()) if got.size else 0.0
            self.stats["spec_trials"] = self.stats.get("spec_trials", 0) + 1
            self._scans_since_retreat = 0
            if round_mean >= self.spec_min_accept + self.spec_reopen_margin:
                # The draft earns its way back with a margin the retreat
                # didn't demand — hysteresis against flapping.
                self._spec_enabled = True
                self._spec_accept_ema = round_mean
                self.stats["spec_accept_ema"] = round(round_mean, 3)
                self.stats["spec_reopened_at_round"] = self.stats["spec_rounds"]
            else:
                self._spec_retrial_interval *= 2  # backoff: trials get rarer
        elif self.spec_adaptive:
            got = counts[:, list(slots)]
            round_mean = float(got.mean()) if got.size else None
            if round_mean is not None:
                self._spec_accept_ema = (
                    0.7 * self._spec_accept_ema + 0.3 * round_mean
                )
            self.stats["spec_accept_ema"] = round(self._spec_accept_ema, 3)
            # Catastrophic first impression: a draft accepting under half
            # the crossover in its opening rounds cannot plausibly
            # recover the EMA from its optimistic start — waiting the ~3
            # rounds the decay needs just burns losing rounds (measured:
            # they were most of the adaptive run's residual loss on short
            # workloads).  Only ever makes the retreat FASTER; an unlucky
            # early call is self-correcting via the re-trial rounds.
            catastrophic = (
                round_mean is not None
                and self.stats["spec_rounds"] <= 2
                and round_mean < 0.5 * self.spec_min_accept
            )
            if self._spec_accept_ema < self.spec_min_accept or catastrophic:
                # Acceptance too low for a spec iteration to beat a plain
                # scan step: retreat to the regular scan (re-triable every
                # spec_retrial_every scans; permanent when that is 0).
                self._spec_enabled = False
                self._scans_since_retreat = 0
                self.stats["spec_disabled_at_round"] = self.stats["spec_rounds"]
        done: list[int] = []
        next_toks = np.array(self._next_tokens_dev)  # writable copy
        for slot in slots:
            req = self.running[slot]
            emitted = gather_tokens(toks, counts, slot)
            finished = False
            for tok in emitted:
                req.output.append(tok)
                if req.on_token is not None:
                    req.on_token(req, tok)
                self.stats["tokens_out"] += 1
                hit_eos = req.eos_id is not None and tok == req.eos_id
                cache_full = (
                    len(req.prompt) + len(req.output) >= self.max_len - self.spec_k - 1
                )
                if (
                    len(req.output) >= req.max_new_tokens
                    or hit_eos
                    or cache_full
                ):
                    finished = True
                    break
            if finished:
                req.finish_time = time.time()
                self.finished.append(req)
                done.append(slot)
            elif emitted:
                next_toks[slot] = emitted[-1]
        # Truncated slots (finished mid-round) have stale device lengths;
        # admission prefill resets them, so only the carry tokens matter.
        self._next_tokens_dev = jnp.asarray(next_toks)
        for slot in done:
            del self.running[slot]
        if done:
            self._slot_cfg = None

    def _finish_admission(self, slot: int, req: Request, tok: int) -> bool:
        """Record the prompt's first token and move the request into the
        running set (shared by whole-prompt and chunked admission; the
        caller samples — batched for whole-prompt admissions — and updates
        the device-side token carry).  Returns False if the request already
        finished (eos / max_new_tokens <= 1)."""
        req.first_token_time = time.time()
        req.output.append(int(tok))
        if req.on_token is not None:
            req.on_token(req, int(tok))
        self._slot_cfg = None  # running set changes: rebuild on device
        self.stats["prefills"] += 1
        self.stats["tokens_out"] += 1
        if (req.eos_id is not None and int(tok) == req.eos_id) or (
            req.max_new_tokens <= 1
        ):
            req.finish_time = time.time()
            self.finished.append(req)
            return False
        self.running[slot] = req
        return True

    def _advance_prefills(self) -> None:
        """Process one chunk for every prefilling slot, then decode resumes;
        a finished prompt samples its first token and joins the running set.
        """
        for slot in list(self.prefilling):
            req, pos = self.prefilling[slot]
            c = self.chunk_prefill
            n = len(req.prompt)
            start = pos
            if start + c > self.max_len:
                # The static-width final chunk must not cross capacity:
                # dynamic_update_slice would clamp the start and overwrite
                # earlier REAL rows with padding.  Shift the window back so
                # it ends at max_len — the overlapped rows are re-written
                # with their own (identical) tokens, which is idempotent.
                start = self.max_len - c
            valid = min(c, n - start)
            toks = np.full((c,), req.prompt[-1], np.int32)
            toks[:valid] = req.prompt[start : start + valid]
            self.cache, logits = self._prefill_chunk(
                self.params,
                jnp.asarray(toks),
                self.cache,
                jnp.int32(slot),
                jnp.int32(start),
                jnp.int32(valid),
            )
            pos = start + valid
            self.stats["prefill_chunks"] = self.stats.get("prefill_chunks", 0) + 1
            if pos < n:
                self.prefilling[slot][1] = pos
                continue
            del self.prefilling[slot]
            if self.draft_params is not None and self._spec_enabled:
                # draft models are small: one whole-prompt draft prefill at
                # chunk completion keeps the caches aligned
                bucket = self._bucket_len(n)
                dtoks = np.full((bucket,), req.prompt[-1], np.int32)
                dtoks[:n] = req.prompt
                self.draft_cache, _ = self._draft_prefill(
                    self.draft_params,
                    jnp.asarray(dtoks),
                    self.draft_cache,
                    jnp.int32(slot),
                    jnp.int32(n),
                )
                self.stats["draft_prefills"] = (
                    self.stats.get("draft_prefills", 0) + 1
                )
                self._draft_stale.discard(slot)
            elif self.draft_params is not None:
                self._draft_stale.add(slot)  # see _admit_round's retreat note
            tok = self._sample_one(logits, req)
            self._next_tokens_dev = self._next_tokens_dev.at[slot].set(tok)
            self._finish_admission(slot, req, tok)

    def _sample_one(self, logits: jax.Array, req: Request) -> int:
        self._rng, sub = jax.random.split(self._rng)
        return int(
            sample(
                logits[None],
                sub,
                temperature=req.temperature,
                top_k=req.top_k,
                top_p=req.top_p,
            )[0]
        )

    def _decode_all(self) -> None:
        """Generate up to scan_steps tokens per running slot in ONE dispatch.

        With a draft model attached, routing is per slot: greedy slots go
        through the speculative draft-verify loop (active-masked); sampled
        slots fall through to the regular scan below.

        Sampling happens on-device inside the scan (per-slot temperature /
        top_k), so the host only sees the [scan_steps, slots] token block.
        Requests finishing mid-scan (eos / max_new_tokens / cache full)
        over-generate until the scan ends; the surplus tokens are dropped
        host-side and the slot is retired — a few wasted device steps buy
        the removal of the ~ms-scale per-token dispatch latency.
        """
        trial = self._spec_trial_due()
        if self.draft_params is not None and (self._spec_enabled or trial):
            # Per-slot routing: greedy slots speculate, sampled slots take
            # the regular scan — one sampled request no longer disables
            # speculation for the whole batch (two dispatches per round
            # only when the batch is actually mixed).
            greedy = [
                s for s, r in self.running.items() if r.temperature <= 0.0
            ]
            sampled = [
                s for s, r in self.running.items() if r.temperature > 0.0
            ]
            if greedy:
                self._decode_speculative(greedy, trial=trial)
            if not sampled:
                return
            decode_slots = sampled
        else:
            decode_slots = list(self.running)
            if self.draft_params is not None and not self._spec_enabled:
                # Count regular scans toward the next re-trial.
                self._scans_since_retreat += 1
        if self._slot_cfg is None:
            active = np.zeros((self.slots,), bool)
            temps = np.zeros((self.slots,), np.float32)
            vocab = getattr(self.cfg, "vocab_size", None) or 1 << 30
            topks = np.full((self.slots,), vocab, np.int32)
            topps = np.ones((self.slots,), np.float32)
            for s in decode_slots:
                req = self.running[s]
                active[s] = True
                temps[s] = req.temperature
                if req.top_k is not None:
                    topks[s] = req.top_k
                if req.top_p is not None:
                    topps[s] = req.top_p
            self._slot_cfg = (
                jnp.asarray(active),
                jnp.asarray(temps),
                jnp.asarray(topks),
                jnp.asarray(topps),
                bool((temps > 0).any()),
                bool((topps < 1.0).any()),  # skip nucleus work when unused
            )
        active_d, temps_d, topks_d, topps_d, sampling, use_top_p = self._slot_cfg
        # Adaptive scan length: a queued arrival waits out the in-flight
        # scan before it can be admitted (admission runs between scans, and
        # with the queue non-empty every slot is necessarily busy — _admit
        # fills free slots first).  Blindly shortening every scan under
        # pressure retires slots sooner but costs ~4x the dispatches and
        # collapses throughput at saturation (measured: 40 req/s p50
        # 405 -> 840 ms).  Instead shorten only to the nearest PREDICTABLE
        # retirement: when some running request is within scan_steps of its
        # max_new_tokens budget, scan just far enough (rounded down to a
        # power of two — one compile per distinct static length, five
        # total) to retire it, admit, and also stop wasting device steps
        # over-generating past its budget.  At saturation with long-lived
        # requests this leaves full-length scans (and throughput) intact.
        # Only under a SHALLOW queue (an arrival burst): a deep queue means
        # saturation, where admission latency is bounded by throughput, and
        # extra short-scan dispatches only lower it (measured at 40 req/s:
        # unguarded rem-shortening cost ~8% tokens/s and ~150 ms p50).
        rems = [
            self.running[s].max_new_tokens - len(self.running[s].output)
            for s in decode_slots
        ]
        # Never scan past every request's remaining budget (pure win: the
        # surplus would be dropped; with pipelining a full surplus scan
        # would otherwise follow every final retirement).  Power-of-two
        # lengths keep the compile count at log2(scan_steps)+1.
        max_rem = max(max(rems), 1)
        steps = min(self.scan_steps, 1 << (max_rem - 1).bit_length())
        steps = max(1, steps)
        if self.scan_tokens_target is not None:
            # Tokens-per-dispatch cap (see __init__): wide batches take
            # shorter scans — dispatch overhead is already amortized and
            # over-generation/slot-hold costs dominate past the target.
            cap = max(1, self.scan_tokens_target // max(len(decode_slots), 1))
            steps = min(steps, 1 << (cap.bit_length() - 1))
        shallow = 0 < (len(self.queue) + len(self.prefilling)) <= max(
            2, self.slots // 4
        )
        if shallow or self.prefilling:
            rem = min(rems)
            if rem < steps:
                steps = max(1, 1 << (max(rem, 1).bit_length() - 1))
        self.cache, toks_dev, self._rng = self._decode_scan(
            self.params,
            self.cache,
            self._next_tokens_dev,
            active_d,
            self._rng,
            temps_d,
            topks_d,
            topps_d,
            sampling,
            use_top_p,
            steps,
        )
        # toks_dev[-1] carries garbage for slots OUTSIDE this scan (greedy
        # slots in mixed mode, empty slots): keep their previous tokens.
        if self.draft_params is not None and len(decode_slots) < len(
            self.running
        ):
            prev = np.array(self._next_tokens_dev)
            new = np.asarray(toks_dev[-1])
            for s in decode_slots:
                prev[s] = new[s]
            self._next_tokens_dev = jnp.asarray(prev)
        else:
            self._next_tokens_dev = toks_dev[-1]
        if self.draft_params is not None:
            # Regular scans advance only the target cache; mark the slots
            # so a future speculative round re-syncs their draft rows (a
            # sampled request never speculates, but its slot may later be
            # re-used — defensive, see _resync_draft_slots).
            self._draft_stale.update(decode_slots)
        self.stats["decode_steps"] += steps
        slot_reqs = [(s, self.running[s]) for s in decode_slots]
        # Pipelining is safe whenever no speculative round can interleave:
        # draft-free engines always, and draft engines once the adaptive
        # guard has PERMANENTLY retreated (_spec_enabled False) — from that
        # point the engine is draft-free in behavior, so it gets the
        # overlapped drain back rather than paying the synchronous loop
        # forever for a draft it no longer uses.
        if (
            self.draft_params is None or not self._spec_enabled
        ) and self.pipeline_scans:
            # Pipelined: the host-side drain (one D2H) happens at the
            # bottom of the NEXT step, overlapped with that step's
            # dispatched scan.
            self._pending = (toks_dev, steps, slot_reqs)
            self.stats["pipelined_scans"] = (
                self.stats.get("pipelined_scans", 0) + 1
            )
        else:
            self._drain_tokens(np.asarray(toks_dev), steps, slot_reqs)

    def _drain_tokens(self, toks, steps: int, slot_reqs) -> None:
        """Host bookkeeping for one scan's [steps, slots] token block:
        append tokens, stream callbacks, retire finished requests."""
        done: list[int] = []
        for slot, req in slot_reqs:
            if req.finish_time is not None:
                # Retired at the previous drain while this scan was already
                # in flight (pipelined over-generation): drop the surplus.
                continue
            finished = False
            for step in range(steps):
                tok = int(toks[step, slot])
                req.output.append(tok)
                if req.on_token is not None:
                    req.on_token(req, tok)
                self.stats["tokens_out"] += 1
                hit_eos = req.eos_id is not None and tok == req.eos_id
                cache_full = (
                    len(req.prompt) + len(req.output) >= self.max_len
                )
                if (
                    len(req.output) >= req.max_new_tokens
                    or hit_eos
                    or cache_full
                ):
                    finished = True
                    break
            if finished:
                req.finish_time = time.time()
                self.finished.append(req)
                done.append(slot)
        for slot in done:
            del self.running[slot]
        if done:
            self._slot_cfg = None
