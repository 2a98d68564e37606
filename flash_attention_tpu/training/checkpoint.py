"""Checkpoint / resume.

The reference has NO checkpointing — only a CHECKPOINT_DIR env export
(setup.sh:16) and copyWeightsToHost without serialization (SURVEY.md §5).
This closes that gap: orbax-backed save/restore of (params, opt_state, step),
working with sharded arrays on a mesh (orbax handles distributed arrays),
plus executable-cache setup (the POPLAR_EXECUTABLE_CACHE_DIR analog).
"""

from __future__ import annotations

import os
import pathlib
from typing import Any

import jax


def save_checkpoint(path: str | os.PathLike, state: Any, *, force: bool = True) -> None:
    """Save a pytree (e.g. {'params': ..., 'opt_state': ..., 'step': ...})."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def restore_checkpoint(path: str | os.PathLike, like: Any | None = None) -> Any:
    """Restore a pytree; `like` (abstract or concrete pytree) restores with
    matching shardings/dtypes when given."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def latest_step_dir(root: str | os.PathLike) -> pathlib.Path | None:
    """Find the highest-numbered step_* checkpoint directory under root."""
    root = pathlib.Path(root)
    if not root.exists():
        return None
    steps = sorted(
        (p for p in root.iterdir() if p.name.startswith("step_")),
        key=lambda p: int(p.name.split("_")[1]),
    )
    return steps[-1] if steps else None


def enable_compilation_cache(cache_dir: str | os.PathLike) -> None:
    """Persistent XLA compilation cache — the analog of the reference's
    POPLAR_EXECUTABLE_CACHE_DIR / POPTORCH_CACHE_DIR (setup.sh:14,21)."""
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
