"""Utilities: patching, profiling, tree helpers."""

from .patching import patch_function, unpatch_function

__all__ = ["patch_function", "unpatch_function"]
