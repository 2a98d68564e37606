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


_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1, "f8e4m3b11fnuz": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}


@dataclasses.dataclass(frozen=True)
class VariableRow:
    """One named array in a pytree: the per-variable size-table row
    (reference get_report_variables analog, demo/profile_utils.py:62-80)."""

    name: str
    shape: tuple[int, ...]
    dtype: str
    bytes: int


def variable_table(tree: Any, *, name: str = "") -> list[VariableRow]:
    """Per-variable size breakdown of a pytree (params / opt_state / cache),
    sorted largest-first — the reference's per-variable report table."""
    rows: list[VariableRow] = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        if not hasattr(leaf, "shape"):
            continue
        label = name + jax.tree_util.keystr(path)
        dt = jax.numpy.asarray(leaf).dtype if not hasattr(leaf, "dtype") else leaf.dtype
        nbytes = getattr(leaf, "nbytes", None)
        if nbytes is None:
            import numpy as _np

            nbytes = int(_np.prod(leaf.shape)) * dt.itemsize
        rows.append(VariableRow(label, tuple(leaf.shape), str(dt), int(nbytes)))
    return sorted(rows, key=lambda r: -r.bytes)


def format_variable_table(rows: list[VariableRow], top: int = 20) -> str:
    mb = 1024 * 1024
    total = sum(r.bytes for r in rows)
    lines = [f"{'variable':48s} {'shape':>20s} {'dtype':>8s} {'MB':>9s}"]
    for r in rows[:top]:
        lines.append(
            f"{r.name[:48]:48s} {str(list(r.shape)):>20s} "
            f"{r.dtype:>8s} {r.bytes / mb:9.2f}"
        )
    if len(rows) > top:
        rest = sum(r.bytes for r in rows[top:])
        lines.append(f"{f'... {len(rows) - top} more':48s} {'':>20s} {'':>8s} {rest / mb:9.2f}")
    lines.append(f"{'TOTAL':48s} {'':>20s} {'':>8s} {total / mb:9.2f}")
    return "\n".join(lines)


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like 'f32[4,128]{1,0}' or 'bf16[]'."""
    dt, _, dims = shape_str.partition("[")
    size = _DTYPE_BYTES.get(dt.strip())
    if size is None:
        return 0  # token/opaque/etc — not a data buffer
    dims = dims.split("]")[0]
    n = 1
    for d in dims.split(","):
        d = d.strip().rstrip("s")  # dynamic-size marker
        if d:
            n *= int(d)
    return n * size


def _hlo_buffers(hlo_text: str) -> list[tuple[str, int, int, int]]:
    """(name, bytes, def_index, last_use_index) for every top-level HLO
    instruction that defines a data buffer, in program order.

    Parsed from the optimized HLO of the main computation; fusion-internal
    temporaries are excluded (they live in fused loops, matching how XLA's
    buffer assignment treats them)."""
    import re

    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?([%\w.\-]+)\s*=\s*(\(?[a-z0-9]+\[[^=]*?)\s*[a-z][\w\-]*\("
    )
    defs: dict[str, tuple[int, int]] = {}  # name -> (bytes, def_idx)
    uses: dict[str, int] = {}
    order: list[str] = []
    in_entry = False
    idx = 0
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = inst_re.match(line)
        if m is None:
            continue
        name, shapes = m.group(1).lstrip("%"), m.group(2)
        total = sum(
            _shape_bytes(s) for s in re.findall(r"[a-z0-9]+\[[^\]]*\]", shapes)
        )
        defs[name] = (total, idx)
        order.append(name)
        for used in re.findall(r"%([\w.\-]+)", line.split("=", 1)[1]):
            if used in defs and used != name:
                uses[used] = idx
        idx += 1
    return [
        (nm, defs[nm][0], defs[nm][1], uses.get(nm, defs[nm][1]))
        for nm in order
    ]


def liveness(fn: Callable, *args: Any, **kwargs: Any):
    """Live-bytes-over-program-order curve for the compiled `fn`.

    The TPU analog of the reference's Poplar liveness plot
    (demo/profile_utils.py:11-60): x = HLO instruction index (program
    order ≈ time), y = bytes of top-level buffers whose def..last-use
    range covers that point.  Returns (steps, live_bytes) arrays.
    """
    import numpy as np

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    text = compiled.as_text()
    bufs = _hlo_buffers(text)
    n = max((lu for _, _, _, lu in bufs), default=0) + 1
    live = np.zeros(n, np.int64)
    for _, nbytes, d, lu in bufs:
        live[d : lu + 1] += nbytes
    return np.arange(n), live


def plot_liveness(
    curves: dict[str, tuple],
    path: str,
    *,
    title: str = "live buffer bytes over program order",
) -> None:
    """Write a liveness comparison plot (e.g. {'flash': ..., 'dense': ...})."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    for label, (steps, live) in curves.items():
        ax.plot(steps, live / (1024 * 1024), label=label)
    ax.set_xlabel("HLO instruction index (program order)")
    ax.set_ylabel("live MB")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


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
