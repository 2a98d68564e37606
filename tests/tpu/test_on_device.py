"""On-hardware kernel matrix — the TPU analog of the reference's on-device
C++ parity tests (/root/reference/tests/cpp/test_flash_attention.cpp:243-313).

Run with:  FA_TPU_TESTS=1 python -m pytest tests/tpu -q

Everything here executes with interpret=False on the real chip.  Interpret
mode does not validate Mosaic tile/layout constraints (a GQA backward once
shipped broken while interpret-green — commit f1c3b7f), so every kernel
configuration the package advertises gets compiled and numerically checked
here against the dense reference, at the reference's tolerance tiers:
fwd 1e-5 fp32 / 1e-2 fp16-class, bwd 1e-4 fp32 / 1e-0 fp16-class
(tests/cpp/test_flash_attention.cpp:245-296; bf16 plays fp16's role).
"""

import os

import pytest

if os.environ.get("FA_TPU_TESTS") != "1":
    pytest.skip("TPU lane disabled (set FA_TPU_TESTS=1)", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() not in ("tpu",):
    pytest.skip(
        f"no TPU backend (got {jax.default_backend()})", allow_module_level=True
    )

from flash_attention_tpu import (
    flash_attention,
    flash_attention_qkv_packed,
    vanilla_attention,
)
from flash_attention_tpu.kernels.flash_attention import flash_attention_with_lse
from flash_attention_tpu.quant import (
    dequantize_kv,
    flash_attention_kv_quant,
    quantize_kv,
)

# (fwd_tol, bwd_tol) per dtype — the reference's tiers.
TOLS = {jnp.float32: (1e-5, 5e-4), jnp.bfloat16: (3e-2, 1e-0)}


def _mk(b, hq, hkv, l, d, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, hq, l, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, l, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, l, d), dtype)
    do = jax.random.normal(ks[3], (b, hq, l, d), dtype)
    return q, k, v, do


def _maxerr(a, b):
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


def _check_fwd_bwd(q, k, v, do, tol_f, tol_b, **kw):
    group = q.shape[1] // k.shape[1]
    kr = jnp.repeat(k, group, axis=1) if group > 1 else k
    vr = jnp.repeat(v, group, axis=1) if group > 1 else v
    d = q.shape[-1]
    sm = d**-0.5

    def f_flash(q, k, v):
        return flash_attention(q, k, v, causal=True, sm_scale=sm, **kw)

    def f_ref(q, kr, vr):
        return vanilla_attention(q, kr, vr, causal=True, sm_scale=sm, **kw)

    out = jax.jit(f_flash)(q, k, v)
    ref = f_ref(q, kr, vr)
    assert _maxerr(out, ref) <= tol_f, f"fwd err {_maxerr(out, ref)}"

    loss_flash = jax.jit(
        jax.grad(
            lambda q, k, v: jnp.sum(
                f_flash(q, k, v).astype(jnp.float32) * do.astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )
    )
    loss_ref = jax.jit(
        jax.grad(
            lambda q, kr, vr: jnp.sum(
                f_ref(q, kr, vr).astype(jnp.float32) * do.astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )
    )
    gf = loss_flash(q, k, v)
    gr = loss_ref(q, kr, vr)
    if group > 1:  # fold the repeated-head reference grads back to kv heads
        b, hq, l, dd = q.shape
        hkv = k.shape[1]
        gr = (
            gr[0],
            gr[1].reshape(b, hkv, group, l, dd).sum(axis=2),
            gr[2].reshape(b, hkv, group, l, dd).sum(axis=2),
        )
    for name, a, bb in zip("qkv", gf, gr):
        assert _maxerr(a, bb) <= tol_b, f"d{name} err {_maxerr(a, bb)}"


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_bwd_parity(dtype):
    tol_f, tol_b = TOLS[dtype]
    _check_fwd_bwd(*_mk(2, 4, 4, 1024, 128, dtype), tol_f, tol_b)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gqa_fwd_bwd(dtype):
    tol_f, tol_b = TOLS[dtype]
    _check_fwd_bwd(*_mk(1, 8, 2, 512, 128, dtype), tol_f, tol_b)


def test_head_dim_64_fwd_bwd():
    tol_f, tol_b = TOLS[jnp.bfloat16]
    _check_fwd_bwd(*_mk(1, 4, 4, 1024, 64, jnp.bfloat16), tol_f, tol_b)


def test_sliding_window():
    tol_f, tol_b = TOLS[jnp.bfloat16]
    _check_fwd_bwd(
        *_mk(1, 4, 4, 1024, 128, jnp.bfloat16), tol_f, tol_b, window=300
    )


def test_unaligned_length_fwd_bwd():
    """L=768: the fwd/bwd block-padding mismatch band (ADVICE round 1)."""
    tol_f, tol_b = TOLS[jnp.float32]
    _check_fwd_bwd(*_mk(1, 2, 2, 768, 128, jnp.float32), tol_f, tol_b)


def test_segments():
    q, k, v, do = _mk(1, 2, 2, 768, 128, jnp.float32)
    segs = jnp.asarray(np.repeat(np.arange(3), 256)[None, :], jnp.int32)
    sm = 128**-0.5
    out = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, sm_scale=sm, segment_ids=segs
        )
    )(q, k, v)
    ref = vanilla_attention(
        q, k, v, causal=True, sm_scale=sm, segment_ids=(segs, segs)
    )
    assert _maxerr(out, ref) <= TOLS[jnp.float32][0]


def test_with_lse_grad():
    """flash_attention_with_lse (the ring-attention entry) on hardware."""
    q, k, v, do = _mk(1, 2, 2, 768, 128, jnp.float32)
    sm = 128**-0.5

    def loss(q, k, v):
        o, lse = flash_attention_with_lse(q, k, v, causal=True, sm_scale=sm)
        return jnp.sum(o * do) + 0.1 * jnp.sum(lse)

    def loss_ref(q, k, v):
        o = vanilla_attention(q, k, v, causal=True, sm_scale=sm)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
        mask = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
        s = jnp.where(mask, s, -jnp.inf)
        lse = jax.scipy.special.logsumexp(s, axis=-1)
        return jnp.sum(o * do) + 0.1 * jnp.sum(lse)

    gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        assert _maxerr(a, b) <= 5e-4, f"d{name} err {_maxerr(a, b)}"


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_kv(dtype):
    q, k, v, _ = _mk(1, 4, 2, 512, 128, jnp.bfloat16)
    kv = quantize_kv(k, v, dtype=dtype)
    kd, vd = dequantize_kv(kv, dtype=jnp.bfloat16)
    out = jax.jit(lambda q, kv: flash_attention_kv_quant(q, kv, causal=True))(
        q, kv
    )
    ref = vanilla_attention(
        q,
        jnp.repeat(kd, 2, axis=1),
        jnp.repeat(vd, 2, axis=1),
        causal=True,
        sm_scale=128**-0.5,
    )
    assert _maxerr(out, ref) <= 3e-2


def test_quant_kv_window_segments():
    q, k, v, _ = _mk(1, 2, 2, 512, 128, jnp.bfloat16)
    segs = jnp.asarray(np.repeat(np.arange(2), 256)[None, :], jnp.int32)
    kv = quantize_kv(k, v, dtype=jnp.int8)
    kd, vd = dequantize_kv(kv, dtype=jnp.bfloat16)
    out = jax.jit(
        lambda q, kv: flash_attention_kv_quant(
            q, kv, causal=True, window=200, segment_ids=segs
        )
    )(q, kv)
    ref = vanilla_attention(
        q, kd, vd, causal=True, sm_scale=128**-0.5, window=200,
        segment_ids=(segs, segs),
    )
    assert _maxerr(out, ref) <= 3e-2


def test_qkv_packed():
    """Reference-parity API (no internal scaling) on hardware."""
    ks = jax.random.split(jax.random.PRNGKey(3), 1)[0]
    qkv = jax.random.normal(ks, (3, 8, 1024, 64), jnp.bfloat16) * 0.1
    out = jax.jit(lambda x: flash_attention_qkv_packed(x, 4, 4))(qkv)
    ref = vanilla_attention(
        qkv[0][:, None], qkv[1][:, None], qkv[2][:, None], causal=True,
        sm_scale=1.0,
    )[:, 0]
    assert _maxerr(out, ref) <= 3e-2


def test_paged_decode_attention():
    """Paged decode kernel (D=128 per-page DMA path) on hardware."""
    from flash_attention_tpu.inference.paged_attention import paged_attention

    batch, h, d = 4, 4, 128
    page_size, pages_per_seq = 64, 8
    max_len = page_size * pages_per_seq
    total_pages = batch * pages_per_seq
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    k_toks = jax.random.normal(ks[0], (batch, h, max_len, d), jnp.bfloat16)
    v_toks = jax.random.normal(ks[1], (batch, h, max_len, d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (batch, h, d), jnp.bfloat16)
    # identity paging: sequence b owns pages [b*pps, (b+1)*pps)
    k_pages = (
        k_toks.transpose(1, 0, 2, 3).reshape(h, total_pages, page_size, d)
    )
    v_pages = (
        v_toks.transpose(1, 0, 2, 3).reshape(h, total_pages, page_size, d)
    )
    page_indices = jnp.arange(total_pages, dtype=jnp.int32).reshape(
        batch, pages_per_seq
    )
    lengths = jnp.asarray([300, 512, 65, 1], jnp.int32)
    out = jax.jit(
        lambda q, kp, vp: paged_attention(q, kp, vp, lengths, page_indices)
    )(q, k_pages, v_pages)
    sm = d**-0.5
    for b in range(batch):
        n = int(lengths[b])
        ref = vanilla_attention(
            q[b : b + 1, :, None],
            k_toks[b : b + 1, :, :n],
            v_toks[b : b + 1, :, :n],
            causal=False,
            sm_scale=sm,
        )[:, :, 0]
        assert _maxerr(out[b : b + 1], ref) <= 3e-2, f"slot {b}"


@pytest.mark.parametrize("quant", [None, jnp.int8])
def test_paged_decode_head_dim_64(quant):
    """Lane-packed paged kernel for head_dim 64 (GPT-2 class) on hardware."""
    from flash_attention_tpu.inference.paged_attention import (
        paged_attention, paged_attention_ref,
    )
    from flash_attention_tpu.quant.kv import quantize_tokens

    batch, h, d = 4, 4, 64
    page_size, pages_per_seq = 128, 4
    max_len = page_size * pages_per_seq
    total_pages = batch * pages_per_seq
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    k_pages = jax.random.normal(
        ks[0], (h, total_pages, page_size, d), jnp.bfloat16
    )
    v_pages = jax.random.normal(
        ks[1], (h, total_pages, page_size, d), jnp.bfloat16
    )
    q = jax.random.normal(ks[2], (batch, h, d), jnp.bfloat16)
    kscale = vscale = None
    if quant is not None:
        k_pages, kscale = quantize_tokens(k_pages, quant)
        v_pages, vscale = quantize_tokens(v_pages, quant)
    page_indices = jnp.arange(total_pages, dtype=jnp.int32).reshape(
        batch, pages_per_seq
    )
    lengths = jnp.asarray([max_len, 300, 129, 1], jnp.int32)
    out = jax.jit(
        lambda q, kp, vp: paged_attention(
            q, kp, vp, lengths, page_indices,
            k_scales=kscale, v_scales=vscale,
        )
    )(q, k_pages, v_pages)
    ref = paged_attention_ref(
        q, k_pages, v_pages, lengths, page_indices,
        k_scales=kscale, v_scales=vscale,
    )
    assert _maxerr(out, ref) <= 3e-2


@pytest.mark.parametrize(
    "hq,hkv,d,quant",
    [(12, 12, 64, None), (12, 12, 64, jnp.int8), (8, 2, 128, jnp.int8)],
)
def test_decode_attention_fused(hq, hkv, d, quant):
    """Slot-major fused-heads decode kernel on hardware: block-diagonal
    single-matmul design, lane packing, ragged lengths, quant scales."""
    import dataclasses

    from flash_attention_tpu.inference import init_cache
    from flash_attention_tpu.inference import kv_cache as kvc
    from flash_attention_tpu.inference.decode_attention import (
        decode_attention, decode_attention_fused,
    )

    s, ll = 4, 1024
    cache = init_cache(2, s, hkv, ll, d, dtype=jnp.bfloat16, quant_dtype=quant)
    for t in range(130):
        kt = jax.random.normal(jax.random.PRNGKey(100 + t), (s, hkv, d), jnp.bfloat16)
        vt = jax.random.normal(jax.random.PRNGKey(200 + t), (s, hkv, d), jnp.bfloat16)
        cache = kvc.decode_write(cache, 1, kt, vt, jnp.full((s,), t, jnp.int32))
    cache = dataclasses.replace(
        cache, lengths=jnp.asarray([129, 64, 1, 127], jnp.int32)
    )
    q = jax.random.normal(jax.random.PRNGKey(7), (s, hq, d), jnp.bfloat16)
    ref = decode_attention(q, cache, 1)
    out = jax.jit(lambda q, c: decode_attention_fused(q, c, 1))(q, cache)
    assert _maxerr(out, ref) <= 3e-2


def test_remat_shrinks_train_memory():
    """cfg.remat must reduce compiled temp memory on the real TPU (the CPU
    backend's accounting does not reflect checkpointing)."""
    import dataclasses

    from flash_attention_tpu.models import gpt
    from flash_attention_tpu.utils.profiling import memory_report

    cfg = gpt.GPTConfig(
        vocab_size=256, block_size=1024, n_layer=8, n_head=8, n_embd=512,
        dropout=0.0, dtype=jnp.bfloat16,
    )
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 1024), 0, 256)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (8, 1024), 0, 256)
    m_plain = memory_report(
        lambda p: jax.grad(lambda q: gpt.loss_fn(q, idx, tgt, cfg))(p), params
    )
    m_remat = memory_report(
        lambda p: jax.grad(lambda q: gpt.loss_fn(q, idx, tgt, cfg_r))(p), params
    )
    assert m_remat.temp_bytes < 0.8 * m_plain.temp_bytes, (
        m_remat.temp_bytes, m_plain.temp_bytes,
    )
