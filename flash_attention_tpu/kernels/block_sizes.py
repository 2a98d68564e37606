"""Block-size selection: the TPU analog of the reference's chunk counts.

The reference kernel is parameterized by `num_chunks_q` / `num_chunks_kv`
(/root/reference/flash_attention_ipu/cpp/flash_attention_qkv_packed.cpp:560-607):
the sequence is split into chunks and iterated with Poplar Repeat loops.  On
TPU the same role is played by Pallas grid block sizes: block_q = L/num_chunks_q
is how many query rows live in VMEM at once, block_kv = L/num_chunks_kv how
many KV rows.  Peak live memory per grid cell is O(block_q*d + block_kv*d +
block_q*block_kv), exactly the reference's memory/time trade.

The auto heuristic reproduces
/root/reference/flash_attention_ipu/_impl/scaled_dot_product_attention.py:46-53:
pick power-of-two chunk counts so a scores block has at most as many elements
as the Q tensor itself.
"""

from __future__ import annotations

import dataclasses
import math

# Hardware-friendly bounds: lanes are 128 wide; fp32 sublanes are 8.
MIN_BLOCK = 128
MAX_BLOCK_Q = 1024
MAX_BLOCK_KV = 1024


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Static tiling configuration for the flash attention kernels.

    Hashable + frozen so it can ride through `jax.custom_vjp` nondiff args.
    """

    block_q: int = 128
    block_kv: int = 128
    # Backward pass tiles (dKV kernel iterates q inside kv; dQ the reverse).
    block_q_dkv: int | None = None
    block_kv_dkv: int | None = None
    block_q_dq: int | None = None
    block_kv_dq: int | None = None

    # The backward kernels hold ~3 (block_q, block_kv) fp32 tiles (p, dp, ds)
    # plus accumulators live at once; blocks above 512 spill VMEM and fall off
    # a cliff (measured: dkv at kv=1024 is 5x slower than kv=512 on v5e), so
    # unspecified backward blocks default to the forward blocks capped at 512.
    _BWD_CAP = 512

    def bwd_dkv(self) -> tuple[int, int]:
        return (
            self.block_q_dkv or min(self.block_q, self._BWD_CAP),
            self.block_kv_dkv or min(self.block_kv, self._BWD_CAP),
        )

    def bwd_dq(self) -> tuple[int, int]:
        return (
            self.block_q_dq or min(self.block_q, self._BWD_CAP),
            self.block_kv_dq or min(self.block_kv, self._BWD_CAP),
        )


def _clamp_pow2(x: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, x))


def _divisor_block(padded_len: int, desired: int) -> int:
    """Largest multiple of MIN_BLOCK that divides `padded_len` and is
    <= `desired`.  `padded_len` is always a multiple of MIN_BLOCK, so
    MIN_BLOCK itself is a valid floor."""
    best = MIN_BLOCK
    b = MIN_BLOCK
    cap = min(desired, padded_len)
    while b <= cap:
        if padded_len % b == 0:
            best = b
        b += MIN_BLOCK
    return best


def resolve_bwd_blocks(
    blocks: BlockSizes, lq_padded: int, lk_padded: int
) -> BlockSizes:
    """Pin the backward block sizes to exact divisors of the padded lengths.

    The forward grid uses ni = lq_padded // block_q with block_q dividing
    lq_padded by construction; the backward kernels do the same floor
    division with their own (possibly 512-capped) blocks.  If a backward
    block does not divide the padded length, the floor silently drops the
    tail rows/columns from dq/dk/dv — or, when padding is driven by the
    larger backward block, the forward never writes the tail o/lse rows and
    the backward reads uninitialized lse (NaN gradients).  Resolving every
    backward block to a divisor of the forward-padded length removes both
    failure modes without extra padding.
    """
    q_dkv, kv_dkv = blocks.bwd_dkv()
    q_dq, kv_dq = blocks.bwd_dq()
    return dataclasses.replace(
        blocks,
        block_q_dkv=_divisor_block(lq_padded, q_dkv),
        block_kv_dkv=_divisor_block(lk_padded, kv_dkv),
        block_q_dq=_divisor_block(lq_padded, q_dq),
        block_kv_dq=_divisor_block(lk_padded, kv_dq),
    )


def auto_num_chunks(seq_len: int, head_dim: int) -> tuple[int, int]:
    """Reference-parity auto-chunking heuristic.

    num_chunks_q = 2^ceil(log2(max(L, D) // D) / 2)
    num_chunks_kv = 2^floor(log2(max(L, D) // D) / 2)
    so that a scores chunk has at most as many elements as Q
    (cf. _impl/scaled_dot_product_attention.py:46-53).
    """
    ratio = max(seq_len, head_dim) // head_dim
    log2 = math.log2(ratio) if ratio > 0 else 0.0
    return 2 ** math.ceil(log2 / 2), 2 ** math.floor(log2 / 2)


def blocks_from_chunks(
    q_len: int,
    kv_len: int,
    num_chunks_q: int,
    num_chunks_kv: int,
) -> BlockSizes:
    """Map reference chunk counts to TPU block sizes.

    Chunk counts give the user's intended memory budget (block = L/chunks);
    we honor it but clamp to hardware-efficient tile bounds, so e.g. 64k
    sequence with 64 chunks gives 1024-row blocks capped at MAX_BLOCK.
    """
    bq = _clamp_pow2(q_len // max(num_chunks_q, 1), MIN_BLOCK, MAX_BLOCK_Q)
    bkv = _clamp_pow2(kv_len // max(num_chunks_kv, 1), MIN_BLOCK, MAX_BLOCK_KV)
    return BlockSizes(block_q=bq, block_kv=bkv)


def default_blocks(
    q_len: int, kv_len: int, head_dim: int, group: int = 1
) -> BlockSizes:
    """Hardware-tuned default tiling when the caller gives no chunk counts.

    Measured on v5e: (1024, 1024) is the forward sweet spot at D=128
    (68 TF/s vs 65 at (512,1024) and 44 at (512,512)).  The q block shrinks
    with the GQA group so the fp32 scores tile (group*block_q, block_kv)
    stays ~4 MB of VMEM.  At 32k+ context a 2048 KV tile wins instead
    (measured: 150 vs 145 TF/s at L=64k, 133 vs 131 at 32k; it LOSES at
    4k, 58 vs 66, where the diagonal-tile causal waste dominates) — but
    only while the fp32 scores tile stays <= 8 MB.  The reference's
    auto_num_chunks heuristic remains the contract for the chunk-count API
    (blocks_from_chunks), not for this.
    """
    bq = _clamp_pow2(1024 // max(group, 1), MIN_BLOCK, MAX_BLOCK_Q)
    bq = min(bq, _round_up_128(q_len))
    bkv = min(MAX_BLOCK_KV, _round_up_128(kv_len))
    if kv_len >= 32768 and bq * max(group, 1) <= 1024:
        bkv = 2048
    return BlockSizes(block_q=bq, block_kv=bkv)


def _round_up_128(x: int) -> int:
    return ((x + 127) // 128) * 128
