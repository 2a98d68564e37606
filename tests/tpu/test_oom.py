"""The library's reason-to-exist, pinned ON HARDWARE: dense attention at a
long context must exhaust the real chip's HBM; the flash kernel at the same
shape must run.

The reference deliberately triggers a device OOM with dense SDPA and shows
the patched flash path fixes it
(/root/reference/tests/python/test_scaled_dot_product_attention.py:116-153).
The CPU-lane analog (tests/test_memory.py) compares compiled temp-memory
analytics; this test makes the actual chip fail.

Kept in its own file AFTER the kernel matrix (pytest runs files in collection
order) so a backend left sour by the failed allocation cannot poison the
parity tests.
"""

import os

import pytest

if os.environ.get("FA_TPU_TESTS") != "1":
    pytest.skip("TPU lane disabled (set FA_TPU_TESTS=1)", allow_module_level=True)

import jax
import jax.numpy as jnp

if jax.default_backend() not in ("tpu",):
    pytest.skip(
        f"no TPU backend (got {jax.default_backend()})", allow_module_level=True
    )

from flash_attention_tpu import flash_attention, vanilla_attention


# Scores alone need b*h*L*L fp32 = 16 * 32768^2 * 4 B = 64 GiB, 4x the
# chip's 16 GiB HBM; q/k/v are only ~400 MiB, so the flash path fits with
# room to spare (it never materializes scores in HBM).
B, H, L, D = 1, 16, 32768, 128


def test_dense_attention_exhausts_hbm_flash_fits():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.bfloat16)

    # Flash first: proves the inputs themselves are fine on this chip.
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))(
        q, k, v
    )
    s = float(jnp.sum(out.astype(jnp.float32)))
    assert s == s, "flash attention produced NaN at the OOM shape"

    # Dense at the same shape must fail to fit (compile-time or run-time
    # RESOURCE_EXHAUSTED depending on toolchain; both surface as a raise).
    dense = jax.jit(
        lambda q, k, v: vanilla_attention(
            q, k, v, causal=True, sm_scale=D**-0.5
        )
    )
    with pytest.raises(Exception, match="RESOURCE_EXHAUSTED|[Oo]ut of memory|exceeds|allocat"):
        r = dense(q, k, v)
        float(jnp.sum(r.astype(jnp.float32)))
