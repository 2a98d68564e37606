"""Profiling and memory-analysis utilities.

TPU-native analog of the reference's libpva tooling
(/root/reference/demo/profile_utils.py:11-80), which plots Poplar liveness
traces and per-variable sizes.  The XLA equivalents:

* `memory_report(fn, *args)` — compiled-executable memory breakdown
  (`compiled.memory_analysis()`): argument/output/temp/generated-code bytes,
  the role of `get_report_variables` per-variable totals.
* `compare_memory(fn_a, fn_b, *args)` — the OOM-foil experiment: the
  reference's whole reason to exist is pinned by a test showing dense SDPA
  OOMs where flash fits (tests/python/test_scaled_dot_product_attention.py:
  116-153); on TPU we compare compiled temp-buffer footprints instead of
  crashing a chip.
* `trace(path)` — context manager around jax.profiler for Perfetto/XProf
  traces (the autoReport analog, demo/train.py:150-161).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable

import jax


@dataclasses.dataclass(frozen=True)
class MemoryReport:
    """Bytes by class for one compiled executable."""

    argument_bytes: int
    output_bytes: int
    temp_bytes: int
    generated_code_bytes: int

    @property
    def peak_bytes(self) -> int:
        """Rough peak live footprint: args + outputs + temps."""
        return self.argument_bytes + self.output_bytes + self.temp_bytes

    def __str__(self) -> str:
        mb = 1024 * 1024
        return (
            f"args {self.argument_bytes / mb:.2f} MB | "
            f"out {self.output_bytes / mb:.2f} MB | "
            f"temp {self.temp_bytes / mb:.2f} MB | "
            f"code {self.generated_code_bytes / mb:.2f} MB"
        )


def memory_report(fn: Callable, *args: Any, **kwargs: Any) -> MemoryReport:
    """Compile `fn` for the given args and return its memory breakdown."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("backend does not expose memory analysis")
    return MemoryReport(
        argument_bytes=int(ma.argument_size_in_bytes),
        output_bytes=int(ma.output_size_in_bytes),
        temp_bytes=int(ma.temp_size_in_bytes),
        generated_code_bytes=int(ma.generated_code_size_in_bytes),
    )


def compare_memory(
    fn_a: Callable, fn_b: Callable, *args: Any
) -> tuple[MemoryReport, MemoryReport]:
    """Memory reports for two implementations of the same computation."""
    return memory_report(fn_a, *args), memory_report(fn_b, *args)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in XProf/TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn: Callable, *args: Any) -> float | None:
    """XLA cost-analysis FLOPs estimate for a jitted function, if exposed."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops")) if cost else None
    except Exception:
        return None
