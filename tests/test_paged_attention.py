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
