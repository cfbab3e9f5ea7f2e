"""Tracing/profiling support.

The reference has no first-party profiler (SURVEY.md §5.1 — only
EventStorage scalars). Here: `jax.profiler` trace capture around training
or inference sections, dumping TensorBoard-compatible traces to
`<output_dir>/profile`, plus a lightweight wall-clock section timer.
"""

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(output_dir: Optional[str], enabled: bool = True):
    """Capture an XLA/TPU profiler trace (open with TensorBoard or xprof)."""
    if not enabled or output_dir is None:
        yield
        return
    trace_dir = os.path.join(output_dir, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class SectionTimer:
    """Host-side cumulative wall-clock timer for pipeline sections."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def report(self) -> str:
        lines = [
            f"{name}: {avg * 1000:.2f} ms/call ({self.counts[name]} calls)"
            for name, avg in sorted(self.summary().items())
        ]
        return "\n".join(lines)
