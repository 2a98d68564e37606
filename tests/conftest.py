"""Test configuration: CPU backend with a virtual 8-device mesh.

The reference runs its whole Python suite without hardware via the PopTorch
IPUModel emulator (tests/python/test_flash_attention_qkv_packed.py:41).  Our
analog: force the CPU backend (Pallas kernels then run in interpreter mode via
flash_attention_tpu.config.use_interpret) and expose 8 virtual devices so the
sharding/collective tests exercise real multi-device code paths.

This must run before jax is imported anywhere in the test process.
"""

import glob
import os
import tempfile

import pytest

# flash_attention's default-blocks path consults the autotune cache
# (kernels/autotune.py::tuned_blocks).  Isolate it so a developer's (or a
# bench run's) tuned entries can't leak nondeterminism into tests; tests
# that exercise the tuner point FA_AUTOTUNE_CACHE at their own tmp_path.
os.environ.setdefault(
    "FA_AUTOTUNE_CACHE",
    os.path.join(tempfile.mkdtemp(prefix="fa_test_autotune_"), "tune.json"),
)

# FA_TPU_TESTS=1 switches to the on-hardware lane: tests/tpu/ runs on the
# real chip (interpret mode cannot catch Mosaic compile/tiling failures —
# see commit f1c3b7f), and the CPU-only suite under tests/ is skipped
# (it assumes the 8-virtual-device CPU flags below, which the TPU lane
# must not set).
TPU_LANE = os.environ.get("FA_TPU_TESTS") == "1"

if TPU_LANE:
    # Exclude the CPU suite however pytest was pointed at the tree.
    collect_ignore = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(os.path.dirname(__file__), "test_*.py"))
    ]
else:
    collect_ignore = ["tpu"]


def pytest_collection_modifyitems(config, items):
    """Fast default lane: tests marked `slow` (the interpret-mode ring /
    dryrun / remat sweeps, ~9 min of an ~18 min suite) only run with
    FA_FULL_TESTS=1.  Zero coverage loss in the full lane; the fast lane
    keeps at least one test per feature area."""
    if os.environ.get("FA_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow sweep; run the full lane with FA_FULL_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

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
