"""Profiling hooks (SURVEY §5 tracing row).

Thin wrappers over ``jax.profiler`` plus a phase-timer for the host loop:
the observability layer the reference lacks entirely (its only instrumentation
is std::cout progress prints)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timer for named host-side phases.

    Blocks on device completion at phase ends so the numbers mean what they
    say.  Usage::

        timer = PhaseTimer()
        with timer.phase("assembly"):
            ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<24s} {t:9.3f}s  x{n:<6d} "
                         f"{t / max(n, 1) * 1e3:9.2f} ms/call")
        return "\n".join(lines)


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function (shows up
    in device traces)."""
    def wrap(fn):
        def inner(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)
        return inner
    return wrap
