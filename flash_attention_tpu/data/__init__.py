"""Data layer: native tokenizer/sampler with NumPy fallback."""

from .loader import CharTokenizer, batch_iterator, load_native_library, sample_batch

__all__ = [
    "CharTokenizer",
    "batch_iterator",
    "load_native_library",
    "sample_batch",
]
