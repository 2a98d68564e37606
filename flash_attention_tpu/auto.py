"""Import-with-side-effect auto-integration.

``import flash_attention_tpu.auto`` patches ``jax.nn.dot_product_attention``
to route onto the Pallas flash kernel — the TPU analog of
``import flash_attention_ipu.auto`` (/root/reference/flash_attention_ipu/auto.py:3).
"""

from .ops.sdpa import install_patch

install_patch()
