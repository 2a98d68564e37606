"""Sharding/collective tests on the virtual 8-device CPU mesh.

The multi-device-without-a-cluster strategy the reference lacks (SURVEY §4
"Multi-node testing: none"): every collective path — DP train step, TP
sharded params, head-parallel shard_map, ring attention ppermute — executes
on 8 virtual devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.kernels import vanilla_attention
from flash_attention_tpu.models import gpt
from flash_attention_tpu.parallel import (
    gpt_param_sharding,
    head_parallel_attention,
    make_mesh,
    ring_attention,
    shard_params,
)
from flash_attention_tpu.training import make_optimizer, make_train_step
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_construction():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4, "seq": 1}
    mesh = make_mesh(data=2, model=-1)
    assert mesh.shape["model"] == 4


def test_ring_attention_parity():
    """Ring attention over 8 seq shards == dense attention."""
    mesh = make_mesh(seq=8)
    b, h, l, d = 1, 2, 8 * 128, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, l, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, d), jnp.float32)
    out = ring_attention(q, k, v, mesh, causal=True)
    ref = vanilla_attention(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_ring_attention_non_causal():
    mesh = make_mesh(seq=8)
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 1024, 64), jnp.float32)
    out = ring_attention(q, q, q, mesh, causal=False)
    ref = vanilla_attention(q, q, q, causal=False, sm_scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_head_parallel_attention_parity():
    """Head-sharded attention (the reference's imagined TP, notebook cell 36)
    with gradients through shard_map."""
    mesh = make_mesh(model=8)
    b, h, l, d = 2, 8, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(4), (b, h, l, d), jnp.float32)
    out = head_parallel_attention(q, q, q, mesh)
    ref = vanilla_attention(q, q, q, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32)
    dq = jax.grad(lambda q: jnp.sum(head_parallel_attention(q, q, q, mesh) * g))(q)
    dq_ref = jax.grad(
        lambda q: jnp.sum(
            vanilla_attention(q, q, q, causal=True, sm_scale=d**-0.5) * g
        )
    )(q)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4, rtol=1e-4)


def test_dp_tp_train_step():
    """Full sharded training step on a 2x4 dp x tp mesh: loss finite and
    identical to the single-device step (collectives are exact)."""
    mesh = make_mesh(data=2, model=4)
    cfg = gpt.GPTConfig(
        vocab_size=64,
        block_size=128,
        n_layer=2,
        n_head=4,
        n_embd=64,
        dropout=0.0,
        dtype=jnp.float32,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, warmup_iters=1, lr_decay_iters=10)
    opt_state = opt.init(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 128), 0, 64)
    rng = jax.random.PRNGKey(3)

    # single-device baseline
    step = jax.jit(make_train_step(cfg, opt))
    p1, _, loss1 = step(params, opt_state, idx, tgt, rng)

    # sharded
    p_shard = gpt_param_sharding(mesh, params)
    b_shard = NamedSharding(mesh, P("data"))
    sharded_step = jax.jit(
        make_train_step(cfg, opt),
        in_shardings=(p_shard, None, b_shard, b_shard, None),
    )
    params_s = shard_params(params, mesh)
    idx_s = jax.device_put(idx, b_shard)
    tgt_s = jax.device_put(tgt, b_shard)
    p2, _, loss2 = sharded_step(params_s, opt_state, idx_s, tgt_s, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_dryrun_entrypoint():
    """The driver-facing dryrun runs end to end."""
    from flash_attention_tpu.parallel.dryrun import dryrun_train_step

    dryrun_train_step(8)


@pytest.mark.slow
def test_ring_attention_grad():
    """Ring attention is differentiable: per-shard lse cotangents fold into
    the kernel bwd (di shift) and KV-shard grads rotate back via the
    transposed ppermute.  Compare against dense attention grads."""
    mesh = make_mesh(seq=4)
    b, h, l, d = 1, 2, 4 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    g = jax.random.normal(ks[3], (b, h, l, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(
            vanilla_attention(q, k, v, causal=True, sm_scale=d**-0.5) * g
        )

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gr, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4, err_msg=f"d{name}"
        )


@pytest.mark.slow
def test_ring_attention_zigzag_parity():
    """Zig-zag (striped) sharding: every device does equal causal work;
    result must match dense attention exactly (up to fp tolerance)."""
    mesh = make_mesh(seq=8)
    b, h, l, d = 1, 2, 16 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    out = ring_attention(q, k, v, mesh, causal=True, zigzag=True)
    ref = vanilla_attention(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_ring_attention_zigzag_grad():
    mesh = make_mesh(seq=4)
    b, h, l, d = 1, 2, 8 * 128, 64
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    g = jax.random.normal(ks[3], (b, h, l, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True, zigzag=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(
            vanilla_attention(q, k, v, causal=True, sm_scale=d**-0.5) * g
        )

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gr, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_tp_inference_matches_single_device():
    """Tensor-parallel llama serving on a 4-way model mesh: prefill +
    decode_loop must produce the same tokens as the unsharded path, with
    params column/row-sharded and the KV cache sharded over kv heads."""
    from flash_attention_tpu.inference import init_cache
    from flash_attention_tpu.models import llama
    from flash_attention_tpu.parallel import (
        make_mesh, shard_llama_for_inference, tp_decode_loop, tp_prefill,
    )

    cfg = llama.LlamaConfig(
        vocab_size=64, n_layer=2, n_head=4, n_kv_head=4, n_embd=32,
        intermediate=64, max_seq=64, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    slots = 2

    def fresh_cache():
        return init_cache(
            cfg.n_layer, slots, cfg.n_kv_head, cfg.max_seq, cfg.head_dim,
            dtype=cfg.dtype,
        )

    prompt = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)

    # single-device reference
    c0 = fresh_cache()
    c0, logits0 = llama.prefill(params, prompt, cfg, c0, jnp.int32(0))
    c0, _ = llama.prefill(params, prompt, cfg, c0, jnp.int32(1))
    first = jnp.full((slots,), int(jnp.argmax(logits0)), jnp.int32)
    _, toks_ref = llama.decode_loop(params, cfg, c0, first, 6)

    # 4-way tensor parallel
    mesh = make_mesh(model=4)
    pp, cc = shard_llama_for_inference(params, fresh_cache(), mesh)
    cc, logits_tp = tp_prefill(pp, prompt, cfg, cc, jnp.int32(0), mesh)
    cc, _ = tp_prefill(pp, prompt, cfg, cc, jnp.int32(1), mesh)
    assert int(jnp.argmax(logits_tp)) == int(first[0])
    cc2, toks_tp = tp_decode_loop(pp, cfg, cc, first, 6, mesh)
    np.testing.assert_array_equal(np.asarray(toks_ref), np.asarray(toks_tp))

    # the updated cache must still be sharded over kv heads
    shard_shapes = {s.data.shape for s in cc2.k.addressable_shards}
    assert all(sh[1] == cfg.n_kv_head // 4 for sh in shard_shapes), shard_shapes


def test_tp_inference_rejects_indivisible_heads():
    from flash_attention_tpu.inference import init_cache
    from flash_attention_tpu.models import llama
    from flash_attention_tpu.parallel import make_mesh, shard_llama_for_inference

    cfg = llama.LlamaConfig(
        vocab_size=64, n_layer=1, n_head=3, n_kv_head=3, n_embd=24,
        intermediate=48, max_seq=64, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = init_cache(1, 1, 3, 64, cfg.head_dim, dtype=cfg.dtype)
    with pytest.raises(ValueError, match="not divisible"):
        shard_llama_for_inference(params, cache, make_mesh(model=4))


def test_llama_dp_tp_train_step():
    """Llama trains sharded: Megatron param specs (shared with TP serving)
    + batch over the data axis; loss matches the single-device step."""
    from flash_attention_tpu.models import llama
    from flash_attention_tpu.parallel import llama_param_specs, make_mesh
    from flash_attention_tpu.training import make_optimizer, make_train_step
    from jax.sharding import NamedSharding

    cfg = llama.LlamaConfig(
        vocab_size=64, n_layer=2, n_head=4, n_kv_head=4, n_embd=32,
        intermediate=64, max_seq=32, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, warmup_iters=1, lr_decay_iters=10)
    opt_state = opt.init(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 32), 0, 64)
    rng = jax.random.PRNGKey(3)

    step = make_train_step(cfg, opt)
    _, _, loss_ref = jax.jit(step)(params, opt_state, idx, tgt, rng)

    mesh = make_mesh(data=2, model=4)
    p_shard = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        llama_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )
    b_shard = NamedSharding(mesh, P("data"))
    step_sharded = jax.jit(
        step, in_shardings=(p_shard, None, b_shard, b_shard, None)
    )
    params_s = jax.tree.map(jax.device_put, params, p_shard)
    new_params, _, loss = step_sharded(
        params_s, opt_state, jax.device_put(idx, b_shard),
        jax.device_put(tgt, b_shard), rng,
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    # updated params keep their TP sharding
    wq = new_params["blocks"][0]["wq"]
    assert len({s.data.shape for s in wq.addressable_shards}) == 1
    assert next(iter(wq.addressable_shards)).data.shape[1] == wq.shape[1] // 4


@pytest.mark.slow
def test_ring_attention_gqa():
    """GQA rides through the ring: Hq != Hkv shards on L like MHA."""
    from flash_attention_tpu.parallel import make_mesh, ring_attention

    mesh = make_mesh(seq=8)
    b, hq, hkv, l, d = 1, 4, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, l, d), jnp.float32)
    out = ring_attention(q, k, v, mesh, causal=True)
    kk = jnp.repeat(k, hq // hkv, axis=1)
    vv = jnp.repeat(v, hq // hkv, axis=1)
    ref = vanilla_attention(q, kk, vv, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# --------------------------------------------------------------------------
# Context-parallel MODEL integration: ring attention inside the transformer
# (VERDICT r4 weak #3: the op must not stay an island).
# --------------------------------------------------------------------------

_CP_CFG = dict(
    vocab_size=64, block_size=256, n_layer=2, n_head=4, n_embd=64,
    dropout=0.0, dtype=jnp.float32,
)


@pytest.mark.slow
def test_gpt_ring_model_forward_and_grad_parity():
    """GPT forward routes through ring attention when a seq mesh is live:
    logits AND parameter gradients (jax.grad through the whole model — the
    lse-cotangent path across shards) match the single-device model.
    (slow lane: the fast lane's test_dp_cp_train_step already drives ring
    attention inside the model with gradients end to end.)"""
    import dataclasses

    mesh = make_mesh(seq=4)
    base = gpt.GPTConfig(**_CP_CFG)
    ring_cfg = dataclasses.replace(base, seq_mesh=mesh)
    params = gpt.init_params(jax.random.PRNGKey(0), base)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 256), 0, 64)

    ref = gpt.forward(params, idx, base)
    out = gpt.forward(params, idx, ring_cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

    l_ref, g_ref = jax.value_and_grad(gpt.loss_fn)(params, idx, tgt, base)
    l_ring, g_ring = jax.value_and_grad(gpt.loss_fn)(params, idx, tgt, ring_cfg)
    np.testing.assert_allclose(float(l_ring), float(l_ref), rtol=1e-5)
    for a, b, path in zip(
        jax.tree.leaves(g_ring), jax.tree.leaves(g_ref),
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3,
            err_msg=str(path[0]),
        )


@pytest.mark.slow
def test_gpt_ring_model_zigzag_parity():
    """Zig-zag context parallelism through the model: tokens permuted once
    at the embedding, logits restored at the head — forward and gradients
    still match the single-device model."""
    import dataclasses

    mesh = make_mesh(seq=4)
    base = gpt.GPTConfig(**_CP_CFG)
    zig_cfg = dataclasses.replace(base, seq_mesh=mesh, seq_zigzag=True)
    params = gpt.init_params(jax.random.PRNGKey(0), base)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 256), 0, 64)

    ref = gpt.forward(params, idx, base)
    out = gpt.forward(params, idx, zig_cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

    l_ref, g_ref = jax.value_and_grad(gpt.loss_fn)(params, idx, tgt, base)
    l_zig, g_zig = jax.value_and_grad(gpt.loss_fn)(params, idx, tgt, zig_cfg)
    np.testing.assert_allclose(float(l_zig), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_zig), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_llama_ring_model_parity():
    """Llama (RoPE + GQA) forward with ring attention inside matches the
    single-device forward; gradients too."""
    import dataclasses

    from flash_attention_tpu.models import llama

    mesh = make_mesh(seq=4)
    base = llama.LlamaConfig(
        vocab_size=64, n_layer=2, n_head=4, n_kv_head=2, n_embd=64,
        intermediate=128, max_seq=256, dtype=jnp.float32,
    )
    ring_cfg = dataclasses.replace(base, seq_mesh=mesh)
    params = llama.init_params(jax.random.PRNGKey(0), base)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 256), 0, 64)

    ref = llama.forward(params, idx, base)
    out = llama.forward(params, idx, ring_cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

    l_ref, g_ref = jax.value_and_grad(llama.loss_fn)(params, idx, tgt, base)
    l_ring, g_ring = jax.value_and_grad(llama.loss_fn)(params, idx, tgt, ring_cfg)
    np.testing.assert_allclose(float(l_ring), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3)


def test_dp_cp_train_step():
    """End-to-end context-parallel TRAINING: a dp x seq mesh, batch [B, T]
    sharded (data, seq), ring attention inside the model, one full
    fwd+bwd+AdamW step — loss and updated params match the single-device
    step (gradients crossed the shard boundary through the ring)."""
    import dataclasses

    from flash_attention_tpu.parallel import seq_batch_sharding

    mesh = make_mesh(data=2, seq=4)
    base = gpt.GPTConfig(**_CP_CFG)
    cp_cfg = dataclasses.replace(base, seq_mesh=mesh, seq_batch_axis="data")
    params = gpt.init_params(jax.random.PRNGKey(0), base)
    opt = make_optimizer(1e-3, warmup_iters=1, lr_decay_iters=10)
    opt_state = opt.init(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 256), 0, 64)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 256), 0, 64)
    rng = jax.random.PRNGKey(3)

    p1, _, loss1 = jax.jit(make_train_step(base, opt))(
        params, opt_state, idx, tgt, rng
    )

    b_shard = seq_batch_sharding(mesh)
    step = jax.jit(
        make_train_step(cp_cfg, opt),
        in_shardings=(None, None, b_shard, b_shard, None),
    )
    p2, _, loss2 = step(
        params, opt_state,
        jax.device_put(idx, b_shard), jax.device_put(tgt, b_shard), rng,
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
