"""Llama-family transformer: RMSNorm + RoPE + SwiGLU + GQA, pure JAX.

Second model family (BASELINE.json configs: "Llama-2 7B GQA prefill+decode,
INT4 weight-only + FP8 KV").  The reference only exercises nanoGPT; this
covers modern decoder architecture features the flash kernel must serve:
rotary embeddings (cache-aware positions), grouped-query attention (native in
the kernel), gated MLPs, untied LM head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention
from ..quant.weights import QuantizedTensor, quantized_matmul
from ..inference import kv_cache as kvc
from ..inference.decode_attention import decode_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 32
    n_embd: int = 4096
    intermediate: int = 11008
    max_seq: int = 4096
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Sequence/context parallelism (training/scoring forward only): when
    # seq_mesh is set, attention routes through ring attention with L
    # sharded over `seq_axis` — see models/gpt.py for the field semantics.
    # RoPE composes cleanly: rotations depend only on each token's
    # absolute position, which the zig-zag path permutes alongside tokens.
    seq_mesh: Any = None
    seq_axis: str = "seq"
    seq_batch_axis: str | None = None
    seq_zigzag: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


LLAMA2_7B = LlamaConfig()
LLAMA3_8B = LlamaConfig(
    vocab_size=128256,
    n_kv_head=8,
    intermediate=14336,
    max_seq=8192,
    rope_theta=500000.0,
)
TINY_LLAMA = LlamaConfig(
    vocab_size=64,
    n_layer=2,
    n_head=4,
    n_kv_head=2,
    n_embd=64,
    intermediate=128,
    max_seq=256,
    dtype=jnp.float32,
)


def init_params(key: jax.Array, cfg: LlamaConfig) -> Params:
    d = cfg.head_dim
    keys = iter(jax.random.split(key, 3 + 7 * cfg.n_layer))

    def lin(fan_in, fan_out, std=0.02):
        return jax.random.normal(next(keys), (fan_in, fan_out), jnp.float32) * std

    def block():
        return {
            "attn_norm": jnp.ones(cfg.n_embd),
            "wq": lin(cfg.n_embd, cfg.n_head * d),
            "wk": lin(cfg.n_embd, cfg.n_kv_head * d),
            "wv": lin(cfg.n_embd, cfg.n_kv_head * d),
            "wo": lin(cfg.n_head * d, cfg.n_embd),
            "mlp_norm": jnp.ones(cfg.n_embd),
            "w_gate": lin(cfg.n_embd, cfg.intermediate),
            "w_up": lin(cfg.n_embd, cfg.intermediate),
            "w_down": lin(cfg.intermediate, cfg.n_embd),
        }

    return {
        "wte": jax.random.normal(next(keys), (cfg.vocab_size, cfg.n_embd)) * 0.02,
        "blocks": [block() for _ in range(cfg.n_layer)],
        "norm_f": jnp.ones(cfg.n_embd),
        "lm_head": lin(cfg.n_embd, cfg.vocab_size),
    }


def _mm(x, w):
    """Matmul that accepts fp32 or weight-only-quantized (QuantizedTensor)."""
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w)
    return x @ w.astype(x.dtype)


def _rms_norm(x, gain, eps):
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * scale * gain).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin tables for the given positions: [..., head_dim/2]."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., None].astype(jnp.float32) * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [..., seq, head_dim]; cos/sin [..., seq, head_dim/2] (split halves)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _project_qkv(x, blk, cfg: LlamaConfig, b, t):
    d = cfg.head_dim
    q = _mm(x, blk["wq"]).reshape(b, t, cfg.n_head, d)
    k = _mm(x, blk["wk"]).reshape(b, t, cfg.n_kv_head, d)
    v = _mm(x, blk["wv"]).reshape(b, t, cfg.n_kv_head, d)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def _mlp(x, blk):
    gate = jax.nn.silu(_mm(x, blk["w_gate"]))
    up = _mm(x, blk["w_up"])
    return _mm(gate * up, blk["w_down"])


def forward(params: Params, idx: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Token ids [B, T] -> logits [B, T, vocab] (training / scoring path)."""
    b, t = idx.shape
    # Context parallelism: with a live seq mesh, attention rides the ring;
    # zig-zag order is applied once at the token level (positions permute
    # with their tokens, so RoPE is untouched semantically) and undone on
    # the logits.  See models/gpt.py::forward for the layout discussion.
    if cfg.seq_mesh is not None:
        n_div = cfg.seq_mesh.shape[cfg.seq_axis] * (2 if cfg.seq_zigzag else 1)
        if t % n_div:
            raise ValueError(
                f"context-parallel forward needs T % {n_div} == 0 (T={t}); "
                "for incremental decoding use a cfg without seq_mesh"
            )
    zig = cfg.seq_mesh is not None and cfg.seq_zigzag
    if zig:
        from ..parallel.ring_attention import zigzag_indices, zigzag_inverse

        n_seq = cfg.seq_mesh.shape[cfg.seq_axis]
        zidx = zigzag_indices(t, n_seq)
        idx = jnp.take(idx, zidx, axis=1)
        positions = zidx
    else:
        positions = jnp.arange(t)
    if cfg.seq_mesh is not None:
        from ..parallel.ring_attention import ring_attention as _ring

        def _attend(q, k, v):
            return _ring(
                q, k, v, cfg.seq_mesh,
                axis_name=cfg.seq_axis,
                causal=True,
                zigzag=cfg.seq_zigzag,
                batch_axis=cfg.seq_batch_axis,
                preordered=cfg.seq_zigzag,
            )
    else:
        def _attend(q, k, v):
            return flash_attention(q, k, v, causal=True)
    x = params["wte"][idx].astype(cfg.dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[None, None], sin[None, None]  # [1, 1, T, half]
    for blk in params["blocks"]:
        xa = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(xa, blk, cfg, b, t)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        y = _attend(q, k, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_head * cfg.head_dim)
        x = x + _mm(y, blk["wo"])
        x = x + _mlp(_rms_norm(x, blk["mlp_norm"], cfg.rms_eps), blk)
    x = _rms_norm(x, params["norm_f"], cfg.rms_eps)
    # Logits stay in the model dtype: the loss casts to fp32 only inside
    # its reductions, so bf16 training keeps a bf16 d_logits and the
    # lm-head backward matmuls run as native bf16 MXU passes (an fp32
    # cast here forced fp32 passes — measured ~15% of the whole train
    # step on the GPT family, models/gpt.py:198-203; argmax decode is
    # unaffected: widening bf16 to fp32 cannot reorder values).
    logits = _mm(x, params["lm_head"])
    if zig:
        logits = jnp.take(logits, zigzag_inverse(t, n_seq), axis=1)
    return logits


def loss_fn(params, idx, targets, cfg: LlamaConfig) -> jax.Array:
    """Mean next-token cross entropy, computed as logsumexp - picked logit
    (never materializes the full log-prob tensor; cf. gpt.loss_fn).
    Max-stabilized with the fp32 cast INSIDE the reductions (fuses into
    the exp/sum pipeline; d_logits stays in the model dtype)."""
    logits = forward(params, idx, cfg)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = m[..., 0].astype(jnp.float32) + jnp.log(
        jnp.sum(jnp.exp((logits - m).astype(jnp.float32)), axis=-1)
    )
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - picked.astype(jnp.float32))


# ----------------------------------------------------------------- inference


def prefill(
    params: Params,
    tokens: jax.Array,
    cfg: LlamaConfig,
    cache: kvc.KVCache,
    slot: jax.Array,
    length: jax.Array | None = None,
) -> tuple[kvc.KVCache, jax.Array]:
    """Prompt [T] -> (cache, last-REAL-token logits).  RoPE-rotated K is
    cached (standard practice: rotation depends only on absolute position).
    `length` handles bucket-padded prompts like model_runner.prefill."""
    t = tokens.shape[0]
    x = params["wte"][tokens].astype(cfg.dtype)[None]
    cos, sin = rope_cos_sin(jnp.arange(t), cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[None, None], sin[None, None]
    for li, blk in enumerate(params["blocks"]):
        xa = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(xa, blk, cfg, 1, t)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        cache = kvc.prefill_write(cache, li, slot, k[0], v[0])
        y = flash_attention(q, k, v, causal=True)
        y = y.transpose(0, 2, 1, 3).reshape(1, t, cfg.n_head * cfg.head_dim)
        x = x + _mm(y, blk["wo"])
        x = x + _mlp(_rms_norm(x, blk["mlp_norm"], cfg.rms_eps), blk)
    x = _rms_norm(x, params["norm_f"], cfg.rms_eps)
    if length is None:
        last, n = x[0, -1], t
    else:
        last, n = jnp.take(x[0], length - 1, axis=0), length
    logits = _mm(last, params["lm_head"]).astype(jnp.float32)
    return kvc.set_length(cache, slot, n), logits


def prefill_chunk(
    params: Params,
    tokens: jax.Array,
    cfg: LlamaConfig,
    cache: kvc.KVCache,
    slot: jax.Array,
    start: jax.Array,
    length: jax.Array | None = None,
) -> tuple[kvc.KVCache, jax.Array]:
    """Chunked prefill (cf. model_runner.prefill_chunk): tokens [C] at
    positions start..start+C-1, attending to the slot's cached prefix plus
    itself.  RoPE uses absolute positions, so chunking changes nothing.
    Engine usage: InferenceEngine(..., prefill_fn=llama.prefill,
    prefill_chunk_fn=llama.prefill_chunk, chunk_prefill=N)."""
    from ..inference.model_runner import _chunk_attention

    c = tokens.shape[0]
    x = params["wte"][tokens].astype(cfg.dtype)[None]
    positions = jnp.clip(start + jnp.arange(c), 0, cache.max_len - 1)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[None, None], sin[None, None]
    for li, blk in enumerate(params["blocks"]):
        xa = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(xa, blk, cfg, 1, c)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        cache = kvc.chunk_write(cache, li, slot, k[0], v[0], start)
        y = _chunk_attention(q, cache, li, slot, start)
        y = y.transpose(0, 2, 1, 3).reshape(1, c, cfg.n_head * cfg.head_dim)
        x = x + _mm(y, blk["wo"])
        x = x + _mlp(_rms_norm(x, blk["mlp_norm"], cfg.rms_eps), blk)
    x = _rms_norm(x, params["norm_f"], cfg.rms_eps)
    valid = jnp.int32(c) if length is None else length
    last = jnp.take(x[0], valid - 1, axis=0)
    logits = _mm(last, params["lm_head"]).astype(jnp.float32)
    return kvc.set_length(cache, slot, start + valid), logits


def decode_step(
    params: Params,
    tokens: jax.Array,
    cfg: LlamaConfig,
    cache: kvc.KVCache,
    active: jax.Array | None = None,
) -> tuple[kvc.KVCache, jax.Array]:
    """One token per slot: tokens [slots] -> (cache, logits [slots, vocab])."""
    s = cache.slots
    d = cfg.head_dim
    positions = jnp.clip(cache.lengths, 0, cache.max_len - 1)
    x = params["wte"][tokens].astype(cfg.dtype)[:, None]  # [S, 1, E]
    cos, sin = rope_cos_sin(positions[:, None], d, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]  # [S, 1, 1, half]
    for li, blk in enumerate(params["blocks"]):
        xa = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(xa, blk, cfg, s, 1)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        cache = kvc.decode_write(cache, li, k[:, :, 0], v[:, :, 0], positions)
        y = decode_attention(q[:, :, 0], cache, li)
        x = x + _mm(y.reshape(s, 1, cfg.n_head * d), blk["wo"])
        x = x + _mlp(_rms_norm(x, blk["mlp_norm"], cfg.rms_eps), blk)
    x = _rms_norm(x, params["norm_f"], cfg.rms_eps)
    logits = _mm(x[:, 0], params["lm_head"]).astype(jnp.float32)
    step = 1 if active is None else active.astype(jnp.int32)
    # stop advancing at capacity (callers retire full sequences)
    step = jnp.where(cache.lengths < cache.max_len - 1, step, 0)
    return kvc.advance_lengths(cache, step), logits


def decode_loop(
    params: Params,
    cfg: LlamaConfig,
    cache: kvc.KVCache,
    first_tokens: jax.Array,
    n_steps: int,
) -> tuple[kvc.KVCache, jax.Array]:
    """On-device greedy decoding: n_steps chained decode steps under one
    lax.scan (single dispatch; the tokens/s benchmark and serving fast path)."""

    def body(carry, _):
        cache, toks = carry
        cache, logits = decode_step(params, toks, cfg, cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (cache, nxt), nxt

    (cache, _), toks = jax.lax.scan(
        body, (cache, first_tokens), None, length=n_steps
    )
    return cache, toks
