"""Paged attention kernel vs gather+dense reference, including ragged
lengths, GQA, and permuted (non-contiguous) page tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.inference.paged_attention import (
    paged_attention,
    paged_attention_ref,
)


def _setup(batch=4, hq=8, hkv=2, d=128, page_size=128, pages_per_seq=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    n_pages = batch * pages_per_seq + 3
    q = jax.random.normal(ks[0], (batch, hq, d), jnp.float32)
    k_pages = jax.random.normal(ks[1], (hkv, n_pages, page_size, d), jnp.float32)
    v_pages = jax.random.normal(ks[2], (hkv, n_pages, page_size, d), jnp.float32)
    # permuted, non-contiguous page assignment
    perm = jax.random.permutation(ks[3], n_pages)[: batch * pages_per_seq]
    page_indices = perm.reshape(batch, pages_per_seq).astype(jnp.int32)
    return q, k_pages, v_pages, page_indices


@pytest.mark.parametrize("ppcb", [2, 4])
def test_paged_parity_ragged_lengths(ppcb):
    q, kp, vp, pi = _setup()
    lengths = jnp.asarray([1024, 700, 128, 1], jnp.int32)  # ragged
    out = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=ppcb)
    ref = paged_attention_ref(q, kp, vp, lengths, pi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_paged_gqa_and_small_pages():
    q, kp, vp, pi = _setup(batch=2, hq=8, hkv=1, d=64, page_size=128, pages_per_seq=4)
    lengths = jnp.asarray([512, 300], jnp.int32)
    out = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=2)
    ref = paged_attention_ref(q, kp, vp, lengths, pi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_paged_skips_beyond_length():
    """A sequence of length 1 must only read its first page (numerically:
    result equals reference regardless of garbage in other pages)."""
    q, kp, vp, pi = _setup(batch=2, pages_per_seq=4)
    # poison pages beyond the first of sequence 0
    kp = kp.at[:, pi[0, 1:]].set(jnp.nan)
    vp = vp.at[:, pi[0, 1:]].set(jnp.nan)
    lengths = jnp.asarray([64, 512], jnp.int32)
    out = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=1)
    assert bool(jnp.all(jnp.isfinite(out[0]))), "read past length!"


@pytest.mark.parametrize("quant_dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_paged_quantized_pages(quant_dtype):
    """Quantized pages with per-token scales match the dequantized reference."""
    q, kp, vp, pi = _setup(batch=2, hq=4, hkv=2, d=64, pages_per_seq=4)
    # quantize pages per token
    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1)
        if quant_dtype == jnp.int8:
            scale = jnp.where(amax == 0, 1.0, amax / 127.0)
            pay = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
        else:
            fmax = float(jnp.finfo(quant_dtype).max)
            scale = jnp.where(amax == 0, 1.0, amax / fmax)
            pay = (x / scale[..., None]).astype(quant_dtype)
        return pay, scale
    kq, ks = quant(kp)
    vq, vs = quant(vp)
    lengths = jnp.asarray([400, 129], jnp.int32)
    out = paged_attention(
        q, kq, vq, lengths, pi, k_scales=ks, v_scales=vs,
        pages_per_compute_block=2,
    )
    ref = paged_attention_ref(q, kq, vq, lengths, pi, k_scales=ks, v_scales=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("quant_dtype", [None, jnp.int8])
def test_decode_attention_paged_matches_einsum(quant_dtype):
    """The paged decode path == the einsum decode path on the same cache."""
    from flash_attention_tpu.inference import init_cache
    from flash_attention_tpu.inference.decode_attention import (
        decode_attention,
        decode_attention_paged,
    )
    from flash_attention_tpu.inference.kv_cache import decode_write, advance_lengths

    slots, hkv, hq, d, max_len = 2, 2, 4, 64, 256
    cache = init_cache(1, slots, hkv, max_len, d, dtype=jnp.float32,
                       quant_dtype=quant_dtype)
    # fill some tokens via decode_write at varying positions
    rng = jax.random.PRNGKey(0)
    for pos in range(5):
        rng, r1, r2 = jax.random.split(rng, 3)
        kn = jax.random.normal(r1, (slots, hkv, d), jnp.float32)
        vn = jax.random.normal(r2, (slots, hkv, d), jnp.float32)
        cache = decode_write(cache, 0, kn, vn, jnp.full((slots,), pos, jnp.int32))
        cache = advance_lengths(cache, 1)
    cache = advance_lengths(cache, -1)  # pretend current token at pos 4
    q = jax.random.normal(jax.random.PRNGKey(9), (slots, hq, d), jnp.float32)
    out_e = decode_attention(q, cache, 0)
    out_p = decode_attention_paged(q, cache, 0, page_size=128)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_e), atol=5e-5, rtol=1e-4
    )
