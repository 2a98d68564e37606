"""Multi-host (DCN) initialization and process-level helpers.

The reference is single-host by construction (PopTorch replication inside one
Poplar process).  TPU pods span hosts: `jax.distributed.initialize` brings up
the coordination service over DCN, after which `jax.devices()` spans the full
slice and every mesh/pjit/shard_map path in this package works unchanged —
collectives ride ICI within a slice and DCN across slices.

On Cloud TPU the coordinator/process env is auto-detected; explicit arguments
cover non-TPU clusters (the reference's `gc-monitor` device discovery has no
cross-host analog to port — this replaces it wholesale).
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize cross-host JAX, returning a topology summary.

    No-ops (with a summary) when already initialized or single-process.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif jax.process_count() == 1:
        # Single process: nothing to initialize; TPU pods auto-detect via
        # jax.distributed.initialize() with no args — try it, tolerate
        # non-cluster environments.
        try:
            jax.distributed.initialize()
        except Exception as e:
            # Expected off-cluster (no coordinator to auto-detect); logged so
            # a real pod misconfiguration isn't silently swallowed.
            logger.info("jax.distributed.initialize() not available: %s", e)
    return topology()


def topology() -> dict:
    """Process/device topology summary (for logs and sanity checks)."""
    devices = jax.devices()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(devices),
        "local_devices": len(jax.local_devices()),
        "platform": devices[0].platform if devices else "none",
    }


def assert_same_across_hosts(value: int, name: str = "value") -> None:
    """Cheap cross-host agreement check via a psum on ones.

    Catches mismatched per-host configs early (a failure mode the reference
    never has to think about)."""
    import jax.numpy as jnp

    total = jax.device_get(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),), jnp.int32) * value
        )
    )[0]
    expected = value * jax.device_count()
    if int(total) != expected:
        raise ValueError(
            f"{name} disagrees across hosts: psum {total} != {expected}"
        )
