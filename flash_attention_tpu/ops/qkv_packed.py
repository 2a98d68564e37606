"""Reference-parity packed-QKV op.

TPU analog of the reference's public op
``flash_attention_ipu.flash_attention_qkv_packed(qkv, num_chunks_q, num_chunks_kv)``
(/root/reference/flash_attention_ipu/_impl/flash_attention_qkv_packed.py:7-58),
including its validation rules (…:20-35) and its contract that NO 1/sqrt(D)
scaling is applied — the caller scales Q (…:55 note).

Where the reference routes to a PopART custom op on IPU and a dense CPU
fallback otherwise, we route to the Pallas kernel (interpret-mode on CPU) with
a dense fallback for sub-block shapes.
"""

from __future__ import annotations

import jax

from ..kernels.flash_attention import flash_attention


def flash_attention_qkv_packed(
    qkv: jax.Array,
    num_chunks_q: int = 1,
    num_chunks_kv: int = 1,
) -> jax.Array:
    """Causally-masked flash attention on a packed QKV tensor.

    Args:
      qkv: [3, num_groups, seq_len, head_dim] — Q, K, V stacked on axis 0;
        num_groups is typically batch*heads flattened.  Q is expected to be
        pre-scaled by the caller (reference parity).
      num_chunks_q / num_chunks_kv: sequence chunking factors; seq_len must be
        divisible by both (reference parity: …:27-35).  On TPU these map to
        Pallas block sizes clamped to hardware-efficient tiles.

    Returns: [num_groups, seq_len, head_dim].
    """
    if qkv.ndim != 4:
        raise ValueError(
            f"qkv must have 4 dimensions [3, groups, seq, head_dim]; got {qkv.ndim}"
        )
    if qkv.shape[0] != 3:
        raise ValueError(f"qkv.shape[0] must be 3; got {qkv.shape[0]}")
    seq_len = qkv.shape[2]
    if seq_len % num_chunks_q != 0:
        raise ValueError(
            f"seq_len ({seq_len}) must be divisible by num_chunks_q ({num_chunks_q})"
        )
    if seq_len % num_chunks_kv != 0:
        raise ValueError(
            f"seq_len ({seq_len}) must be divisible by num_chunks_kv ({num_chunks_kv})"
        )
    q, k, v = qkv[0], qkv[1], qkv[2]
    # Fold groups into the head axis of a batch-1 call: [1, G, L, D].
    out = flash_attention(
        q[None],
        k[None],
        v[None],
        causal=True,
        sm_scale=1.0,  # reference does not scale inside the op
        num_chunks_q=num_chunks_q,
        num_chunks_kv=num_chunks_kv,
    )
    return out[0]
