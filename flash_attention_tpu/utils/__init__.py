"""Utilities: patching, profiling, device discovery."""

from .measure import ab_compare, chain_timer
from .patching import patch_function, unpatch_function
from .profiling import MemoryReport, compare_memory, flops_estimate, memory_report, trace

__all__ = [
    "MemoryReport",
    "ab_compare",
    "chain_timer",
    "compare_memory",
    "flops_estimate",
    "memory_report",
    "patch_function",
    "trace",
    "unpatch_function",
]
