"""Experiment: batched admission-time first-token sampling.

The old admission path sampled each admitted request's first token with
`_sample_one` — per request: an rng split dispatch + a sample dispatch +
an int() D2H fetch, ~3 tunnel roundtrips EACH — and wrote the token into
the device-side carry with a per-slot .at[].set (another dispatch).  The
new path samples the whole admission chunk in ONE dispatch (argmax
fast-path when every request is greedy) and batch-updates the carry.

Same-session interleaved A/B: OldAdmit emulates the per-request path by
overriding `_first_tokens` (the batched carry update is shared, so the
measured delta is the sampling roundtrips only — slightly UNDERSTATES
the old cost).  Run on the real chip:

    python bench/exp_admit.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flash_attention_tpu.inference.engine import InferenceEngine  # noqa: E402
from flash_attention_tpu.models import gpt  # noqa: E402


class OldAdmit(InferenceEngine):
    def _first_tokens(self, reqs, logits):
        toks = [
            self._sample_one(logits[i], r) for i, r in enumerate(reqs)
        ]
        arr = np.asarray(toks, np.int32)
        return jnp.asarray(arr), arr


def capacity(cls, params, cfg, prompts, slots=8, scan_steps=16,
             max_new_tokens=64):
    eng = cls(params, cfg, slots=slots, max_len=512, scan_steps=scan_steps)
    for p in prompts[: slots + 2]:
        eng.submit(p, max_new_tokens=scan_steps)
    eng.run()
    eng.finished.clear()
    t0 = time.perf_counter()
    for p in prompts:
        eng.submit(p, max_new_tokens=max_new_tokens)
    eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.output) for r in eng.finished)
    return toks / dt


def main():
    cfg = gpt.GPT2_124M
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # short requests maximize admission frequency (the path under test)
    prompts = [
        rng.integers(0, cfg.vocab_size, 200).tolist() for _ in range(32)
    ]
    results = {"old": [], "new": []}
    for rep in range(3):
        for name, cls in (("old", OldAdmit), ("new", InferenceEngine)):
            r = capacity(cls, params, cfg, prompts, max_new_tokens=16)
            results[name].append(r)
            print(f"rep{rep} {name}: {r:7.0f} tok/s", flush=True)
    print(
        "old best %.0f / new best %.0f (short 16-token requests, "
        "admission-dominated)"
        % (max(results["old"]), max(results["new"]))
    )


if __name__ == "__main__":
    main()
