"""Drop-in scaled dot-product attention with flash routing.

TPU analog of the reference's SDPA auto-patch layer
(/root/reference/flash_attention_ipu/_impl/scaled_dot_product_attention.py):
where the reference monkey-patches ``torch.nn.functional
.scaled_dot_product_attention`` to reroute nanoGPT onto the IPU custom op, we
provide (a) an explicit ``dot_product_attention`` with the same call
convention as ``jax.nn.dot_product_attention`` (BTNH layout) that routes onto
the Pallas kernel, and (b) ``import flash_attention_tpu.auto`` which installs
it over ``jax.nn.dot_product_attention`` so existing JAX model code picks up
the flash path with zero changes.

Feature gating mirrors the reference (…:21-41): unsupported arguments fall
back to the reference implementation rather than erroring — except the
reference *rejects* GQA, while our kernel supports it natively.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention


def _window_from_local(local_window_size, is_causal) -> tuple[bool, int | None]:
    """Map jax.nn's local_window_size to the kernel's causal window.

    jax.nn semantics: int or (left, right), attend [i-left, i+right].
    Expressible here iff causal with right == 0 -> window = left + 1.
    Returns (supported, window)."""
    if local_window_size is None:
        return True, None
    if not is_causal:
        return False, None
    if isinstance(local_window_size, int):
        left, right = local_window_size, 0
    else:
        left, right = local_window_size
    if right != 0:
        return False, None
    return True, left + 1


def _supported(bias, mask, query_seq_lengths, key_value_seq_lengths) -> bool:
    return (
        bias is None
        and mask is None
        and query_seq_lengths is None
        and key_value_seq_lengths is None
    )


def _try_flash(query, key, value, bias, mask, kwargs) -> jax.Array | None:
    """Route onto the flash kernel if the arguments are expressible there.

    Single source of truth for the gating used by both the explicit
    ``dot_product_attention`` entry point and the installed patch wrapper.
    Returns None when the call must fall back to the stock implementation.
    """
    is_causal = kwargs.get("is_causal", False)
    win_ok, window = _window_from_local(
        kwargs.get("local_window_size"), is_causal
    )
    if (
        not _supported(
            bias,
            mask,
            kwargs.get("query_seq_lengths"),
            kwargs.get("key_value_seq_lengths"),
        )
        or not win_ok
        or kwargs.get("implementation") in ("xla", "cudnn")
    ):
        return None
    # BTNH -> BNTH for the kernel.
    q = jnp.swapaxes(query, 1, 2)
    k = jnp.swapaxes(key, 1, 2)
    v = jnp.swapaxes(value, 1, 2)
    out = flash_attention(
        q, k, v, causal=is_causal, sm_scale=kwargs.get("scale"), window=window
    )
    return jnp.swapaxes(out, 1, 2)


def dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    scale: float | None = None,
    is_causal: bool = False,
    query_seq_lengths: jax.Array | None = None,
    key_value_seq_lengths: jax.Array | None = None,
    local_window_size: int | tuple[int, int] | None = None,
    implementation: str | None = None,
    **kwargs: Any,
) -> jax.Array:
    """``jax.nn.dot_product_attention``-compatible entry point.

    Shapes: query [B, T, N, H]; key/value [B, S, K, H] with N % K == 0.
    Routes to the Pallas flash kernel when the arguments are expressible
    there; otherwise falls back to the stock XLA implementation (the
    reference's "fall through to the original function" behavior, …:60-61).
    """
    route_kwargs = dict(
        scale=scale,
        is_causal=is_causal,
        query_seq_lengths=query_seq_lengths,
        key_value_seq_lengths=key_value_seq_lengths,
        local_window_size=local_window_size,
        implementation=implementation,
    )
    out = _try_flash(query, key, value, bias, mask, route_kwargs)
    if out is not None:
        return out
    return jax.nn.dot_product_attention(
        query, key, value, bias=bias, mask=mask, **route_kwargs, **kwargs
    )


def install_patch() -> None:
    """Monkey-patch ``jax.nn.dot_product_attention`` with the flash router.

    The analog of ``import flash_attention_ipu.auto``
    (/root/reference/flash_attention_ipu/auto.py:3).  Idempotent.
    """
    import jax.nn as jnn

    from ..utils.patching import patch_function

    original = jnn.dot_product_attention
    if getattr(original, "__wrapped__", None) is not None:
        return  # already patched

    @patch_function(original, [jnn])
    def _flash_sdpa(orig, query, key, value, bias=None, mask=None, **kwargs):
        out = _try_flash(query, key, value, bias, mask, kwargs)
        if out is not None:
            return out
        return orig(query, key, value, bias=bias, mask=mask, **kwargs)


def uninstall_patch() -> None:
    """Restore the stock ``jax.nn.dot_product_attention``."""
    import jax.nn as jnn

    from ..utils.patching import unpatch_function

    patched = jnn.dot_product_attention
    if getattr(patched, "__wrapped__", None) is not None:
        unpatch_function(patched, [jnn])
