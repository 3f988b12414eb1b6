"""Tracing & profiling: per-stage timers and jax.profiler integration.

The reference has no formal tracer (SURVEY.md §5 — vestigial
memory_profiler hooks, deepof/data.py:1029). This build makes profiling a
first-class aux subsystem: lightweight nested stage timers for the host
pipeline, and XLA-level traces via jax.profiler for device work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating nested wall-clock stage timers.

    Usage:
        timer = StageTimer()
        with timer.stage("preprocess"):
            ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack = []

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.totals[full] += time.perf_counter() - t0
            self.counts[full] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            depth = name.count("/")
            lines.append(
                f"{'  ' * depth}{name.split('/')[-1]:<30} "
                f"{self.totals[name]:8.3f}s  x{self.counts[name]}"
            )
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


# A process-wide default timer the pipeline stages report into.
GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Time a block into the global timer."""
    with GLOBAL_TIMER.stage(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str, annotate: Optional[str] = None) -> Iterator[None]:
    """XLA-level device trace (viewable in TensorBoard / xprof).

    Wraps jax.profiler.trace; use around jitted hot sections.
    """
    import jax

    with jax.profiler.trace(logdir):
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield


def annotate(name: str):
    """Named device-side trace annotation (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
