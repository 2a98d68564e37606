"""Op/API layer tests: qkv-packed op, SDPA drop-in, auto-patch.

Mirrors the reference's Python integration suite
(tests/python/test_flash_attention_qkv_packed.py and
test_scaled_dot_product_attention.py): validation errors, flash-vs-dense
parity through the public API, and the patch/unpatch mechanics the reference
exercises via ``__wrapped__``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flash_attention_tpu
from flash_attention_tpu import dot_product_attention, flash_attention_qkv_packed
from flash_attention_tpu.kernels import auto_num_chunks, vanilla_attention
from flash_attention_tpu.ops.sdpa import install_patch, uninstall_patch


def _packed_ref(qkv):
    q, k, v = qkv[0], qkv[1], qkv[2]
    return vanilla_attention(q, k, v, causal=True, sm_scale=1.0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("seq", [256, 1024])
def test_qkv_packed_parity(dtype, seq):
    """IPU(chunked 16x16) vs CPU(dense) parity test shape family
    (test_flash_attention_qkv_packed.py:56-93): N=4 groups, D=128."""
    qkv = jax.random.normal(jax.random.PRNGKey(0), (3, 4, seq, 128), dtype)
    qkv = qkv.at[0].multiply(128**-0.5)  # caller scales Q (reference parity)
    out = flash_attention_qkv_packed(qkv, 16, 16)
    ref = _packed_ref(qkv)
    # reference tolerances: atol 1e-3 / rtol 1e-5 fp32, atol+rtol 1e-2 fp16
    atol, rtol = (1e-3, 1e-5) if dtype == jnp.float32 else (1e-2, 1e-2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=rtol
    )


def test_qkv_packed_validation():
    """Same error conditions as _impl/flash_attention_qkv_packed.py:20-35."""
    with pytest.raises(ValueError, match="4 dimensions"):
        flash_attention_qkv_packed(jnp.zeros((3, 256, 64)))
    with pytest.raises(ValueError, match="must be 3"):
        flash_attention_qkv_packed(jnp.zeros((2, 4, 256, 64)))
    with pytest.raises(ValueError, match="num_chunks_q"):
        flash_attention_qkv_packed(jnp.zeros((3, 4, 256, 64)), 3, 1)
    with pytest.raises(ValueError, match="num_chunks_kv"):
        flash_attention_qkv_packed(jnp.zeros((3, 4, 256, 64)), 1, 3)


def test_qkv_packed_grad():
    """Gradient through the packed op: sum(out * g) loss, the reference's
    SGD(lr=1) trick (test_flash_attention_qkv_packed.py:30-53)."""
    qkv = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 256, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 128), jnp.float32)

    d_flash = jax.grad(lambda x: jnp.sum(flash_attention_qkv_packed(x, 4, 4) * g))(qkv)
    d_ref = jax.grad(lambda x: jnp.sum(_packed_ref(x) * g))(qkv)
    np.testing.assert_allclose(d_flash, d_ref, atol=1e-4, rtol=1e-4)


def test_auto_chunk_heuristic():
    """Reference heuristic values (scaled_dot_product_attention.py:46-53):
    chosen so a scores chunk has <= as many elements as Q."""
    for seq, d in [(256, 64), (1024, 64), (4096, 128), (64, 64)]:
        nq, nkv = auto_num_chunks(seq, d)
        # power-of-two chunk counts
        assert nq & (nq - 1) == 0 and nkv & (nkv - 1) == 0
        # scores chunk no bigger than Q
        assert (seq // nq) * (seq // nkv) <= seq * d
        # q chunking at least as aggressive as kv chunking
        assert nq >= nkv


@pytest.mark.parametrize("batch_shape", [(2,), (2, 3)])
def test_sdpa_parity(batch_shape):
    """Patched-SDPA vs dense parity over batch shapes, the reference's
    test_scaled_dot_product_attention_vs_cpu (…py:59-113), head dim 64."""
    b = int(np.prod(batch_shape))
    q = jax.random.normal(jax.random.PRNGKey(3), (b, 256, 4, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, 256, 4, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, 256, 4, 64), jnp.float32)
    out = dot_product_attention(q, k, v, is_causal=True)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_sdpa_fallback_on_unsupported():
    """bias/mask args fall through to the stock implementation (the
    reference rejects them; we downgrade gracefully, …py:21-41)."""
    q = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 2, 64), jnp.float32)
    bias = jnp.zeros((2, 2, 64, 64))
    out = dot_product_attention(q, q, q, bias=bias)
    ref = jax.nn.dot_product_attention(q, q, q, bias=bias)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_auto_patch_roundtrip():
    """The auto module patches jax.nn.dot_product_attention and can be
    un-patched via __wrapped__ (reference OOM test mechanics, …py:116-153)."""
    original = jax.nn.dot_product_attention
    assert getattr(original, "__wrapped__", None) is None
    install_patch()
    try:
        patched = jax.nn.dot_product_attention
        assert patched.__wrapped__ is original
        q = jax.random.normal(jax.random.PRNGKey(7), (1, 256, 2, 64), jnp.float32)
        out = jax.nn.dot_product_attention(q, q, q, is_causal=True)
        ref = original(q, q, q, is_causal=True)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    finally:
        uninstall_patch()
    assert jax.nn.dot_product_attention is original


def test_version():
    assert flash_attention_tpu.__version__


def test_sdpa_local_window():
    """local_window_size routes to the kernel's sliding window."""
    q = jax.random.normal(jax.random.PRNGKey(8), (1, 512, 2, 64), jnp.float32)
    out = dot_product_attention(q, q, q, is_causal=True, local_window_size=(127, 0))
    ref = jax.nn.dot_product_attention(
        q, q, q, is_causal=True, local_window_size=(127, 0)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    # non-causal window falls back to stock implementation
    out2 = dot_product_attention(q, q, q, is_causal=False, local_window_size=(4, 4))
    ref2 = jax.nn.dot_product_attention(
        q, q, q, is_causal=False, local_window_size=(4, 4)
    )
    np.testing.assert_allclose(out2, ref2, atol=2e-5, rtol=1e-5)
