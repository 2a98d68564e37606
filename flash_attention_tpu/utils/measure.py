"""Measurement discipline for tunneled/queued TPU backends.

Codifies what rounds 3-4 established the hard way (DESIGN.md sections
6-8):

* One jit dispatch through the axon tunnel costs ~7-8 ms of latency that
  does NOT pipeline across queued executions, so short kernels must be
  timed as DEEP chains inside one jit — ``chain_timer`` uses a
  ``lax.scan`` whose carry feeds each iteration (CSE-proof), fetching a
  single host scalar at the end (``block_until_ready`` does not
  synchronize through the tunnel).
* Session-to-session drift is several percent (the same kernel read
  103.9 and 101.6 TF/s in two sessions with no code change), so a
  performance CLAIM requires an INTERLEAVED same-session A/B —
  ``ab_compare`` runs base, variants, then base again, and reports the
  drift band so a "win" smaller than the band is visibly noise.

Cited against the reference's device-cycles bench discipline
(/root/reference/tests/cpp/test_flash_attention.cpp:177-240): counting
cycles around only the program under test is exactly what deep in-jit
chains recover through a high-latency tunnel.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

__all__ = ["chain_timer", "ab_compare"]


def chain_timer(
    f: Callable[..., jax.Array],
    *args: Any,
    depth: int = 64,
    iters: int = 3,
    reduce_best: bool = True,
) -> float:
    """Seconds per call of ``f(carry, *rest)`` measured as a depth-`depth`
    ``lax.scan`` chain inside one jit.

    ``f`` must return an array broadcast-compatible with its first
    argument (the carry) so iterations chain data-dependently and CSE
    cannot collapse them.  Returns best-of-`iters` (min) by default —
    the right statistic under one-sided tunnel-stall noise — else mean.
    """

    @jax.jit
    def chained(first, *rest):
        out, _ = jax.lax.scan(
            lambda c, _: (f(c, *rest).astype(first.dtype), None),
            first,
            None,
            length=depth,
        )
        return jnp.sum(out.astype(jnp.float32))

    float(chained(*args))  # compile + warm
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = chained(*args)
        float(s)  # host scalar fetch = the only real sync through axon
        samples.append(time.perf_counter() - t0)
    agg = min(samples) if reduce_best else sum(samples) / len(samples)
    return agg / depth


def ab_compare(
    variants: Mapping[str, Callable[..., jax.Array]],
    *args: Any,
    depth: int = 64,
    iters: int = 3,
    base: str | None = None,
) -> dict[str, float]:
    """Interleaved same-session A/B: time every variant, then re-time the
    first (or `base`) variant as ``<base>+recheck``.

    Returns {name: seconds_per_call}.  The |base - base+recheck| spread
    is the session's drift band: treat any variant delta inside it as
    noise, not signal.
    """
    names = list(variants)
    base = base or names[0]
    results: dict[str, float] = {}
    for name in names:
        results[name] = chain_timer(variants[name], *args, depth=depth, iters=iters)
    results[f"{base}+recheck"] = chain_timer(
        variants[base], *args, depth=depth, iters=iters
    )
    return results
