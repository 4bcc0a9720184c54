"""Profiling/tracing hooks (the reference has none — SURVEY.md §5).

Thin wrappers over ``jax.profiler``: named trace annotations around
frontend/training phases and an on-demand TensorBoard trace dump, plus a
simple wall-clock section timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in TPU profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: Path):
    """Capture a profiler trace for the enclosed region (view with
    TensorBoard or xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating section timer for host-side phases."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = (self.sections.get(name, 0.0) +
                                   time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{name}: {secs:.3f}s ({100 * secs / max(total, 1e-9):.1f}%)"
                 for name, secs in sorted(self.sections.items(),
                                          key=lambda kv: -kv[1])]
        return "\n".join(lines)
