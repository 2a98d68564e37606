"""Test configuration: CPU backend with a virtual 8-device mesh.

The reference runs its whole Python suite without hardware via the PopTorch
IPUModel emulator (tests/python/test_flash_attention_qkv_packed.py:41).  Our
analog: force the CPU backend (Pallas kernels then run in interpreter mode via
flash_attention_tpu.config.use_interpret) and expose 8 virtual devices so the
sharding/collective tests exercise real multi-device code paths.

This must run before jax is imported anywhere in the test process.
"""

import os

# FA_TPU_TESTS=1 switches to the on-hardware lane: tests/tpu/ runs on the
# real chip (interpret mode cannot catch Mosaic compile/tiling failures —
# see commit f1c3b7f), and the CPU-only suite under tests/ is skipped.
TPU_LANE = os.environ.get("FA_TPU_TESTS") == "1"

collect_ignore = [] if TPU_LANE else ["tpu"]

if not TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Some TPU platform plugins register themselves regardless of
    # JAX_PLATFORMS; the config update pins the backend for real.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
