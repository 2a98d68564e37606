"""Measured block-size autotuning for the flash attention kernels.

The reference picks chunk counts with a closed-form heuristic
(/root/reference/flash_attention_ipu/_impl/scaled_dot_product_attention.py:46-53);
this repo's `default_blocks` encodes the hand-tuned v5e equivalents.
Both are guesses about a particular chip.  This module replaces the
guess with a measurement: sweep candidate tilings ON THE LIVE CHIP with
the drift-proof timing protocol (utils.measure.chain_timer — deep
lax.scan chains, best-of-N) and cache the winner per (shape, dtype,
causal, mode) in a JSON file, so production code pays the sweep once
per configuration per chip generation.

Usage:
    from flash_attention_tpu.kernels.autotune import tuned_blocks
    bs = tuned_blocks(q.shape, k.shape[2], q.dtype, causal=True,
                      num_kv_heads=k.shape[1])  # REQUIRED for GQA —
    # the cache key includes the GQA group; omitting it assumes MHA and
    # a GQA model's tuned entry would silently never be found
    flash_attention(q, k, v, block_sizes=bs)

or end-to-end: ``autotune(q, k, v, causal=True)`` returns the best
BlockSizes after sweeping (and caches it).

The cache file defaults to ``~/.cache/flash_attention_tpu/autotune.json``
(override with FA_AUTOTUNE_CACHE).  Entries are keyed by a device-kind
string, so a cache written on v5e does not leak onto other generations.
"""

from __future__ import annotations

import json
import os
import pathlib
import threading
from typing import Any, Iterable

import jax
import jax.numpy as jnp

from ..utils.measure import chain_timer
from .block_sizes import MIN_BLOCK, BlockSizes, default_blocks

__all__ = [
    "autotune", "autotune_for_model", "tuned_blocks", "candidate_blocks",
    "clear_cache",
]

_LOCK = threading.Lock()
_MEM: dict[str, Any] | None = None


def _cache_path() -> pathlib.Path:
    env = os.environ.get("FA_AUTOTUNE_CACHE")
    if env:
        return pathlib.Path(env)
    return pathlib.Path.home() / ".cache" / "flash_attention_tpu" / "autotune.json"


def _load() -> dict[str, Any]:
    global _MEM
    if _MEM is None:
        p = _cache_path()
        try:
            _MEM = json.loads(p.read_text())
        except (OSError, ValueError):
            _MEM = {}
    return _MEM


def _save() -> None:
    """Merge-then-rename: re-read the file and overlay our entries so a
    concurrent process's tunings survive, and write via a temp file +
    os.replace so a reader never sees a torn file.  Last-writer-wins per
    KEY, not per file."""
    p = _cache_path()
    try:
        p.parent.mkdir(parents=True, exist_ok=True)
        merged: dict[str, Any] = {}
        try:
            merged = json.loads(p.read_text())
        except (OSError, ValueError):
            pass
        merged.update(_MEM or {})
        tmp = p.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_text(json.dumps(merged, indent=1, sort_keys=True))
        os.replace(tmp, p)
    except OSError:
        pass  # cache is an optimization; never fail the caller


def clear_cache() -> None:
    global _MEM
    with _LOCK:
        _MEM = {}
        try:
            _cache_path().unlink()
        except OSError:
            pass


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # noqa: BLE001 — no backend at all
        return "unknown"


def _key(b, h, lq, lk, d, dtype, causal, group) -> str:
    return (
        f"{_device_kind()}|b{b}h{h}q{lq}k{lk}d{d}|{jnp.dtype(dtype).name}"
        f"|causal={int(causal)}|g{group}"
    )


def candidate_blocks(lq: int, lk: int, d: int, group: int = 1) -> list[BlockSizes]:
    """Hardware-sensible sweep set around the measured v5e optima:
    q blocks {512, 1024}, kv blocks {512, 1024, 2048}, clamped to the
    (128-aligned) sequence lengths, deduplicated, default first."""
    def r128(x):
        return max(MIN_BLOCK, min(x, ((lk + 127) // 128) * 128))

    seen: list[BlockSizes] = []
    first = default_blocks(lq, lk, d, group)
    for bs in [first] + [
        BlockSizes(block_q=bq, block_kv=bkv)
        for bq in (1024, 512)
        for bkv in (1024, 2048, 512)
    ]:
        bq = max(MIN_BLOCK, min(bs.block_q, ((lq + 127) // 128) * 128))
        bkv = r128(bs.block_kv)
        # fp32 scores tile must stay within VMEM (~8 MB ceiling measured)
        if group * bq * bkv * 4 > 8 * 1024 * 1024:
            continue
        cand = BlockSizes(block_q=bq, block_kv=bkv)
        if cand not in seen:
            seen.append(cand)
    return seen


def autotune(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    depth: int = 32,
    iters: int = 2,
    candidates: Iterable[BlockSizes] | None = None,
    use_cache: bool = True,
) -> BlockSizes:
    """Sweep candidate tilings of `flash_attention` on the live backend
    and return (and cache) the fastest.  Forward-only timing: the
    backward blocks stay at their own measured defaults (512-capped)."""
    from .flash_attention import flash_attention

    b, h, lq, d = q.shape
    hkv, lk = k.shape[1], k.shape[2]
    group = h // hkv
    key = _key(b, h, lq, lk, d, q.dtype, causal, group)
    if use_cache:
        with _LOCK:
            hit = _load().get(key)
        if hit is not None:
            return BlockSizes(block_q=hit["block_q"], block_kv=hit["block_kv"])

    cands = list(candidates) if candidates is not None else candidate_blocks(
        lq, lk, d, group
    )
    best: tuple[float, BlockSizes] | None = None
    for bs in cands:
        try:
            dt = chain_timer(
                lambda c, kk, vv: flash_attention(
                    c, kk, vv, causal=causal, block_sizes=bs
                ),
                q, k, v, depth=depth, iters=iters,
            )
        except Exception:  # noqa: BLE001 — a candidate that fails to compile loses
            continue
        if best is None or dt < best[0]:
            best = (dt, bs)
    if best is None:
        return default_blocks(lq, lk, d, group)
    if use_cache:
        with _LOCK:
            _load()[key] = {
                "block_q": best[1].block_q,
                "block_kv": best[1].block_kv,
                "seconds_per_call": best[0],
            }
            _save()
    return best[1]


def autotune_for_model(
    cfg,
    batch_size: int,
    *,
    seq_len: int | None = None,
    causal: bool = True,
    dtype=None,
    **kw,
) -> BlockSizes:
    """Warm the tuned-blocks cache for a model's self-attention shape.

    cfg: a GPTConfig or LlamaConfig (anything with head_dim / n_head and
    block_size or max_seq).  Builds dummy q/k/v at the model's attention
    geometry ([B, H, L, D], GQA-aware) and runs `autotune`, so subsequent
    `flash_attention` calls at that shape — the trainer's forward, the
    engine's whole-prompt prefill — pick the measured tiling via the
    default-blocks path.  The warm-up hooks (Trainer.warmup_autotune,
    InferenceEngine.warmup_autotune) call this."""
    d = cfg.head_dim
    h = cfg.n_head
    hkv = (
        cfg.kv_heads if hasattr(cfg, "kv_heads")
        else getattr(cfg, "n_kv_head", None) or h
    )
    l = seq_len or getattr(cfg, "block_size", None) or cfg.max_seq
    dtype = dtype or cfg.dtype
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (batch_size, h, l, d), dtype)
    k = jax.random.normal(ks[1], (batch_size, hkv, l, d), dtype)
    v = jax.random.normal(ks[2], (batch_size, hkv, l, d), dtype)
    return autotune(q, k, v, causal=causal, **kw)


def tuned_blocks(
    q_shape: tuple[int, int, int, int],
    kv_len: int,
    dtype,
    *,
    causal: bool = True,
    num_kv_heads: int | None = None,
) -> BlockSizes | None:
    """Cache-only lookup: the tuned BlockSizes for this configuration on
    this device kind, or None if never autotuned (callers then fall back
    to default_blocks via flash_attention's normal path).

    num_kv_heads MUST be passed for GQA models (it is part of the cache
    key, matching what autotune() derived from the real k tensor);
    None means MHA.  If the exact group misses, groups LARGER than the
    requested one are probed as a fallback: an entry tuned at a larger
    group chose its q block under a tighter rows = group*bq VMEM budget,
    so it is safe (if conservative) at a smaller group — the reverse is
    not (an MHA-tuned bq applied to a large GQA group can blow VMEM),
    so smaller groups are never probed."""
    b, h, lq, d = q_shape
    group = h // (num_kv_heads or h)
    groups = [group] + [
        g for g in range(group + 1, h + 1) if h % g == 0
    ]
    with _LOCK:
        cache = _load()
        for g in groups:
            hit = cache.get(_key(b, h, lq, kv_len, d, dtype, causal, g))
            if hit is not None:
                return BlockSizes(block_q=hit["block_q"], block_kv=hit["block_kv"])
    return None
