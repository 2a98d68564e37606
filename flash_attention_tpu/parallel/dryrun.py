"""Multi-chip dry-run: compile + execute the sharded training step.

Used by __graft_entry__.dryrun_multichip: the driver runs this with N virtual
CPU devices (xla_force_host_platform_device_count) to validate that the
dp x tp sharded training step and the seq-sharded ring attention compile and
execute without real chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import gpt
from ..training.optimizer import make_optimizer
from ..training.trainer import make_train_step
from .mesh import DATA_AXIS, make_mesh
from .ring_attention import ring_attention
from .sharding import gpt_param_sharding
from jax.sharding import NamedSharding, PartitionSpec as P


def dryrun_train_step(n_devices: int) -> None:
    """One dp x tp sharded train step + one ring-attention fwd, tiny shapes."""
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            "(set xla_force_host_platform_device_count)"
        )
    dp = 2 if n_devices % 2 == 0 else 1
    tp = n_devices // dp
    mesh = make_mesh(data=dp, model=tp, devices=devices[:n_devices])

    # Tiny GPT: dims chosen divisible by tp for clean head/hidden sharding.
    cfg = gpt.GPTConfig(
        vocab_size=128,
        block_size=128,
        n_layer=2,
        n_head=max(tp, 2),
        n_embd=max(tp, 2) * 16,
        dropout=0.0,
        dtype=jnp.float32,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, warmup_iters=1, lr_decay_iters=10)
    opt_state = opt.init(params)

    p_shard = gpt_param_sharding(mesh, params)
    b_shard = NamedSharding(mesh, P(DATA_AXIS))
    step = jax.jit(
        make_train_step(cfg, opt),
        in_shardings=(p_shard, None, b_shard, b_shard, None),
    )

    batch = dp * 2
    idx = jnp.zeros((batch, cfg.block_size), jnp.int32)
    tgt = jnp.ones((batch, cfg.block_size), jnp.int32)
    idx = jax.device_put(idx, b_shard)
    tgt = jax.device_put(tgt, b_shard)
    params_s = jax.tree.map(jax.device_put, params, p_shard)

    new_params, _, loss = step(params_s, opt_state, idx, tgt, jax.random.PRNGKey(1))
    jax.block_until_ready(new_params)
    assert jnp.isfinite(loss), f"non-finite loss {loss}"

    # Ring attention over a seq-only mesh on the same devices: both the
    # contiguous schedule and the zig-zag (striped) causal-load-balanced
    # one.  KV rotations are double-buffered — the ppermute for step s+1
    # is issued before step s's kernel, so ICI transfers overlap compute.
    seq_mesh = make_mesh(seq=n_devices, devices=devices[:n_devices])
    b, h, l, d = 1, 2, 256 * n_devices, 64
    q = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, d), jnp.float32)
    out = ring_attention(q, q, q, seq_mesh, causal=True)
    out_z = ring_attention(q, q, q, seq_mesh, causal=True, zigzag=True)
    jax.block_until_ready((out, out_z))
    assert out.shape == q.shape
    zerr = float(jnp.max(jnp.abs(out - out_z)))
    assert zerr < 1e-4, f"zigzag mismatch {zerr}"

    # Context-parallel TRAINING end to end: a dp x seq mesh, batch [B, T]
    # sharded (data, seq), ring attention INSIDE the transformer
    # (GPTConfig.seq_mesh), one full fwd+bwd+AdamW step — gradients cross
    # the shard boundary through the ring's lse-cotangent path.  Loss is
    # pinned against the unsharded step (collectives are exact in fp32).
    import dataclasses

    from .mesh import SEQ_AXIS, seq_batch_sharding

    sp = 4 if n_devices % 4 == 0 else n_devices
    dpc = n_devices // sp
    cp_mesh = make_mesh(data=dpc, seq=sp, devices=devices[:n_devices])
    cp_block = 64 * sp  # L = 64 tokens per shard
    cp_base = dataclasses.replace(cfg, block_size=cp_block)
    cp_cfg = dataclasses.replace(
        cp_base, seq_mesh=cp_mesh, seq_batch_axis=DATA_AXIS,
    )
    cp_params = gpt.init_params(jax.random.PRNGKey(4), cp_base)
    cp_opt_state = opt.init(cp_params)
    cp_batch = max(dpc, 2)
    cp_idx = jax.random.randint(
        jax.random.PRNGKey(5), (cp_batch, cp_block), 0, cfg.vocab_size
    )
    cp_tgt = jax.random.randint(
        jax.random.PRNGKey(6), (cp_batch, cp_block), 0, cfg.vocab_size
    )
    cp_rng = jax.random.PRNGKey(7)
    _, _, cp_loss_ref = jax.jit(make_train_step(cp_base, opt))(
        cp_params, cp_opt_state, cp_idx, cp_tgt, cp_rng
    )
    cp_shard = seq_batch_sharding(cp_mesh)
    cp_step = jax.jit(
        make_train_step(cp_cfg, opt),
        in_shardings=(None, None, cp_shard, cp_shard, None),
    )
    cp_params2, _, cp_loss = cp_step(
        cp_params, cp_opt_state,
        jax.device_put(cp_idx, cp_shard), jax.device_put(cp_tgt, cp_shard),
        cp_rng,
    )
    jax.block_until_ready(cp_params2)
    cp_err = abs(float(cp_loss) - float(cp_loss_ref))
    assert cp_err < 1e-5, (
        f"context-parallel train-step loss mismatch: {float(cp_loss)} vs "
        f"{float(cp_loss_ref)} (|diff| {cp_err:.2e})"
    )

    # Tensor-parallel SERVING: llama prefill + decode_loop with params
    # column/row-sharded and the KV cache sharded over kv heads.
    from ..inference import init_cache
    from ..models import llama
    from .inference_tp import (
        shard_llama_for_inference, tp_decode_loop, tp_prefill,
    )

    lcfg = llama.LlamaConfig(
        vocab_size=64, n_layer=2, n_head=tp, n_kv_head=tp,
        n_embd=tp * 16, intermediate=tp * 32, max_seq=64,
        dtype=jnp.float32,
    )
    lparams = llama.init_params(jax.random.PRNGKey(3), lcfg)
    tp_mesh = make_mesh(model=tp, devices=devices[:tp])
    lcache = init_cache(
        lcfg.n_layer, 2, lcfg.n_kv_head, lcfg.max_seq, lcfg.head_dim,
        dtype=lcfg.dtype,
    )
    lparams, lcache = shard_llama_for_inference(lparams, lcache, tp_mesh)
    prompt = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
    lcache, logits = tp_prefill(
        lparams, prompt, lcfg, lcache, jnp.int32(0), tp_mesh
    )
    first = jnp.full((2,), jnp.argmax(logits), jnp.int32)
    lcache, toks = tp_decode_loop(lparams, lcfg, lcache, first, 3, tp_mesh)
    jax.block_until_ready(toks)

    print(
        f"dryrun ok: dp={dp} tp={tp} train-step loss={float(loss):.4f}; "
        f"ring attention over seq={n_devices} at L={l} "
        f"(overlapped ppermute; zigzag balanced schedule matches: "
        f"max|diff|={zerr:.2e}); context-parallel train step dp={dpc} x "
        f"seq={sp} at L={cp_block} with ring attention inside the model "
        f"(grads through the ring): loss {float(cp_loss):.4f} == "
        f"unsharded {float(cp_loss_ref):.4f} (|diff| {cp_err:.1e}); "
        f"tp={tp} llama serving decode ran "
        f"({toks.shape[0]} steps, cache sharded over kv heads)"
    )
