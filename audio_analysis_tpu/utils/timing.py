"""
Tracing / profiling utilities.

The reference has no timers or profiler hooks at all (SURVEY §5). Here:
- BlockTimer: wall-clock per analysis block, rendered as a deterministic-
  format (values obviously vary) timing table for report footers and logs;
- profile_trace: context manager around jax.profiler.trace for `--profile-dir`
  CLI support (produces TensorBoard-loadable traces of the device work).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple


@dataclass
class BlockTimer:
    """Accumulates named block durations in insertion order."""

    blocks: List[Tuple[str, float]] = field(default_factory=list)
    _starts: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def block(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.blocks.append((name, time.perf_counter() - start))

    def total_seconds(self) -> float:
        return sum(t for _, t in self.blocks)

    def as_markdown(self) -> str:
        lines = ["\n## Timing\n", "", "| Block | Seconds |", "|---|---|"]
        for name, seconds in self.blocks:
            lines.append(f"| {name} | {seconds:.3f} |")
        lines.append(f"| **total** | **{self.total_seconds():.3f}** |")
        return "\n".join(lines) + "\n"

    def as_text(self) -> str:
        return "\n".join(f"{name}: {seconds:.3f}s" for name, seconds in self.blocks)


@contextlib.contextmanager
def profile_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace when a directory is given, else a no-op."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
