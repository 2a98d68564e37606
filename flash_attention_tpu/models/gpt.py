"""GPT-2-class causal transformer in pure functional JAX.

The model layer the reference exercises through nanoGPT
(/root/reference/demo/train.py uses karpathy/nanoGPT as a submodule with
PopTorch patching).  We own the model instead: a functional params-pytree
transformer sized like nanoGPT configs (shakespeare-char 10.67M, GPT-2 124M),
with attention routed through the Pallas flash kernel and a GQA extension
(n_kv_head) the reference lacks.

Pure functions over an explicit params pytree — the idiomatic JAX shape for
pjit/sharding: every weight is addressable by path for PartitionSpec rules
(see flash_attention_tpu/parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention
from ..kernels.vanilla import vanilla_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """nanoGPT-compatible configuration (demo/train.py:32-67 field set)."""

    vocab_size: int = 50304
    block_size: int = 1024
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    n_kv_head: int | None = None  # GQA: None means MHA (n_head kv heads)
    dropout: float = 0.0
    bias: bool = True
    dtype: Any = jnp.bfloat16  # activation/compute dtype (params stay fp32)
    use_flash: bool = True  # False = dense attention (the OOM foil, SURVEY §4)
    # Rematerialize each transformer block in the backward pass
    # (jax.checkpoint): activation memory drops from O(n_layer) block
    # activations to O(1) + recompute — the standard TPU trade of FLOPs for
    # HBM, enabling larger batch x block than fit otherwise.
    remat: bool = False
    # LayerNorm variance via E[x^2] - mu^2 (one reduction pass; flax's
    # use_fast_variance default, measured -0.35 ms/step here).  The
    # one-pass form loses precision when a row's |mean| >> std
    # (cancellation: relative variance error ~ eps * mu^2/var); typical
    # LN inputs have mu^2/var = O(1) where it is exact to ~1e-7, but set
    # False to restore jnp.var's two-pass form for ill-conditioned rows.
    fast_ln: bool = True
    # Sequence/context parallelism: when seq_mesh is a jax.sharding.Mesh
    # with `seq_axis` among its axis names, every attention routes through
    # ring attention (parallel/ring_attention.py) — activations stay
    # sequence-sharded through the whole transformer and KV shards rotate
    # over ICI (the TPU analog of mapping the reference's kv Repeat loop
    # axis onto devices, cpp/flash_attention_qkv_packed.cpp:311).
    # seq_batch_axis: mesh axis the batch dim is sharded over (set to
    # "data" for dp x cp training so the ring's shard_map keeps the batch
    # distributed).  seq_zigzag: causal load balancing — the forward
    # permutes tokens into zig-zag chunk order ONCE at the embedding and
    # restores logits order at the head, so per-layer attention needs no
    # reorder (ring_attention(preordered=True)).
    seq_mesh: Any = None
    seq_axis: str = "seq"
    seq_batch_axis: str | None = None
    seq_zigzag: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def kv_heads(self) -> int:
        return self.n_kv_head or self.n_head


# nanoGPT shakespeare-char and GPT-2 124M presets (demo/train.py:32-38 + GPT-2).
SHAKESPEARE_CHAR = GPTConfig(
    vocab_size=65, block_size=256, n_layer=6, n_head=6, n_embd=384, dropout=0.2
)
GPT2_124M = GPTConfig()


def _linear_init(key, fan_in, fan_out, std=0.02):
    return jax.random.normal(key, (fan_in, fan_out), jnp.float32) * std


def init_params(key: jax.Array, cfg: GPTConfig) -> Params:
    """GPT-2 init: N(0, 0.02), residual projections scaled by 1/sqrt(2L)."""
    keys = iter(jax.random.split(key, 4 + 4 * cfg.n_layer))
    d = cfg.head_dim
    qkv_out = (cfg.n_head + 2 * cfg.kv_heads) * d
    proj_std = 0.02 / math.sqrt(2 * cfg.n_layer)

    def block_params():
        return {
            "ln1": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
            "attn": {
                "wqkv": _linear_init(next(keys), cfg.n_embd, qkv_out),
                "bqkv": jnp.zeros(qkv_out) if cfg.bias else None,
                "wo": _linear_init(next(keys), cfg.n_embd, cfg.n_embd, proj_std),
                "bo": jnp.zeros(cfg.n_embd) if cfg.bias else None,
            },
            "ln2": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
            "mlp": {
                "wfc": _linear_init(next(keys), cfg.n_embd, 4 * cfg.n_embd),
                "bfc": jnp.zeros(4 * cfg.n_embd) if cfg.bias else None,
                "wproj": _linear_init(next(keys), 4 * cfg.n_embd, cfg.n_embd, proj_std),
                "bproj": jnp.zeros(cfg.n_embd) if cfg.bias else None,
            },
        }

    return {
        "wte": jax.random.normal(next(keys), (cfg.vocab_size, cfg.n_embd)) * 0.02,
        "wpe": jax.random.normal(next(keys), (cfg.block_size, cfg.n_embd)) * 0.02,
        "blocks": [block_params() for _ in range(cfg.n_layer)],
        "lnf": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
        # lm_head is weight-tied to wte (nanoGPT convention)
    }


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def _layer_norm(x, p, eps=1e-5, fast=True):
    # fast=True: variance via E[x^2] - mu^2 — ONE reduction pass instead
    # of mean-then-squared-deviation's two (flax's use_fast_variance
    # default; measured -0.35 ms/step on the 124M train step).  The
    # max(., 0) guards the cancellation edge; see GPTConfig.fast_ln for
    # the precision trade and the two-pass escape hatch.
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if fast:
        ex2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = jnp.maximum(ex2 - mu * mu, 0.0)
    else:
        var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _attention(x, p, cfg: GPTConfig, rng, deterministic):
    b, t, e = x.shape
    d = cfg.head_dim
    h, hkv = cfg.n_head, cfg.kv_heads
    qkv = x @ p["wqkv"].astype(x.dtype)
    if p["bqkv"] is not None:
        qkv = qkv + p["bqkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, [h * d, (h + hkv) * d], axis=-1)
    # [B, T, H*D] -> [B, H, T, D]
    q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, hkv, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, hkv, d).transpose(0, 2, 1, 3)
    if cfg.seq_mesh is not None:
        # Context-parallel attention: L stays sharded over cfg.seq_axis;
        # the kernel runs per shard and KV rotates around the ICI ring.
        from ..parallel.ring_attention import ring_attention

        y = ring_attention(
            q, k, v, cfg.seq_mesh,
            axis_name=cfg.seq_axis,
            causal=True,
            zigzag=cfg.seq_zigzag,
            batch_axis=cfg.seq_batch_axis,
            preordered=cfg.seq_zigzag,  # forward() pre-orders tokens once
        )
    elif cfg.use_flash:
        y = flash_attention(q, k, v, causal=True)
    else:
        if hkv != h:
            k = jnp.repeat(k, h // hkv, axis=1)
            v = jnp.repeat(v, h // hkv, axis=1)
        y = vanilla_attention(q, k, v, causal=True, sm_scale=d**-0.5)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    y = y @ p["wo"].astype(x.dtype)
    if p["bo"] is not None:
        y = y + p["bo"].astype(x.dtype)
    return _dropout(y, cfg.dropout, rng, deterministic)


def _mlp(x, p, cfg: GPTConfig, rng, deterministic):
    y = x @ p["wfc"].astype(x.dtype)
    if p["bfc"] is not None:
        y = y + p["bfc"].astype(x.dtype)
    y = jax.nn.gelu(y)
    y = y @ p["wproj"].astype(x.dtype)
    if p["bproj"] is not None:
        y = y + p["bproj"].astype(x.dtype)
    return _dropout(y, cfg.dropout, rng, deterministic)


def forward(
    params: Params,
    idx: jax.Array,
    cfg: GPTConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Token ids [B, T] -> logits [B, T, vocab]."""
    b, t = idx.shape
    if t > cfg.block_size:
        raise ValueError(f"sequence length {t} > block_size {cfg.block_size}")
    rngs = (
        jax.random.split(rng, 2 * cfg.n_layer + 1)
        if rng is not None
        else [None] * (2 * cfg.n_layer + 1)
    )
    # Zig-zag context parallelism: permute tokens into zig-zag chunk order
    # ONCE here (and positions with them — the attention body assumes the
    # striped layout), restore order on the logits at the head.  LN/MLP
    # are position-independent, so nothing else notices.
    if cfg.seq_mesh is not None:
        n_div = cfg.seq_mesh.shape[cfg.seq_axis] * (2 if cfg.seq_zigzag else 1)
        if t % n_div:
            raise ValueError(
                f"context-parallel forward needs T % {n_div} == 0 (T={t}, "
                f"seq axis {cfg.seq_mesh.shape[cfg.seq_axis]}"
                f"{', zigzag doubles the chunking' if cfg.seq_zigzag else ''});"
                " for incremental decoding use a cfg without seq_mesh"
            )
    zig = cfg.seq_mesh is not None and cfg.seq_zigzag
    if zig:
        from ..parallel.ring_attention import zigzag_indices, zigzag_inverse

        n_seq = cfg.seq_mesh.shape[cfg.seq_axis]
        zidx = zigzag_indices(t, n_seq)
        idx = jnp.take(idx, zidx, axis=1)
        pos = zidx
    else:
        pos = None
    # jax.named_scope plays the role of the reference's pervasive
    # DebugContext names (e.g. "o_i += attn_ij @ v_j") so profiler traces
    # read as algebra (SURVEY.md §5 "Tracing / profiling").
    with jax.named_scope("embed"):
        wpe = params["wpe"][:t] if pos is None else params["wpe"][pos]
        x = params["wte"][idx] + wpe
        x = x.astype(cfg.dtype)
        x = _dropout(x, cfg.dropout, rngs[0], deterministic)
    def block_fn(x, blk, rng_a, rng_m):
        x = x + _attention(
            _layer_norm(x, blk["ln1"], fast=cfg.fast_ln),
            blk["attn"], cfg, rng_a, deterministic
        )
        return x + _mlp(
            _layer_norm(x, blk["ln2"], fast=cfg.fast_ln),
            blk["mlp"], cfg, rng_m, deterministic
        )

    if cfg.remat:
        block_fn = jax.checkpoint(block_fn)
    for li, blk in enumerate(params["blocks"]):
        with jax.named_scope(f"block{li}"):
            x = block_fn(x, blk, rngs[1 + 2 * li], rngs[2 + 2 * li])
    x = _layer_norm(x, params["lnf"], fast=cfg.fast_ln)
    # Weight-tied lm head.  Logits stay in the model dtype: the loss casts
    # to fp32 only inside its reductions, so bf16 training keeps a bf16
    # d_logits and the two 633-GFLOP lm-head backward matmuls run in native
    # bf16 MXU passes (an fp32 logits cast here forced them to fp32 passes
    # — measured ~15% of the whole train step).
    logits = jnp.einsum("bte,ve->btv", x, params["wte"].astype(x.dtype))
    if zig:
        logits = jnp.take(logits, zigzag_inverse(t, n_seq), axis=1)
    return logits


def loss_fn(
    params: Params,
    idx: jax.Array,
    targets: jax.Array,
    cfg: GPTConfig,
    *,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Mean cross-entropy next-token loss (nanoGPT's objective).

    Computed as logsumexp(logits) - logits[target] rather than through
    jax.nn.log_softmax: the full [B, T, vocab] fp32 log-prob tensor
    (1.65 GB at the GPT-2 train shape) is never materialized — the fp32
    cast fuses into the reductions.  Measured: -9% train step time.
    """
    logits = forward(params, idx, cfg, rng=rng, deterministic=deterministic)
    # Max-stabilized logsumexp with the fp32 cast INSIDE (fuses into the
    # exp/sum elementwise pipeline; d_logits stays in the model dtype).
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = m[..., 0].astype(jnp.float32) + jnp.log(
        jnp.sum(jnp.exp((logits - m).astype(jnp.float32)), axis=-1)
    )
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - picked.astype(jnp.float32))


def generate(
    params: Params,
    idx: jax.Array,
    cfg: GPTConfig,
    *,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Naive full-recompute sampling (nanoGPT generate parity).

    The inference engine (flash_attention_tpu.inference) is the production
    decode path with a KV cache; this exists for demo/test parity.
    """
    if cfg.seq_mesh is not None:
        # Context parallelism is a training-path feature: incremental
        # decoding feeds arbitrary-length contexts, which cannot satisfy
        # the ring's per-shard divisibility — sample single-device.
        cfg = dataclasses.replace(cfg, seq_mesh=None)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    for _ in range(max_new_tokens):
        ctx = idx[:, -cfg.block_size :]
        logits = forward(params, ctx, cfg)[:, -1, :].astype(jnp.float32)
        logits = logits / max(temperature, 1e-6)
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        rng, sub = jax.random.split(rng)
        nxt = jax.random.categorical(sub, logits)
        idx = jnp.concatenate([idx, nxt[:, None]], axis=1)
    return idx
