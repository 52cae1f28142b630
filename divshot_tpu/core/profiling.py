"""Profiling helpers (SURVEY §5.1) — the jax.profiler/xprof analog of the
reference's Tracy macros (``DS_PROFILE_SCOPE/FUNCTION/FRAMEMARKER``,
``core/profiler.h:16-20``): named trace scopes, a step timer with
block_until_ready fencing, and an on-demand device-trace capture."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any

import jax


@contextlib.contextmanager
def profile_scope(name: str):
    """Named scope visible in xprof/perfetto traces (DS_PROFILE_SCOPE)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def profile_function(fn):
    """Decorator: wrap a function in a trace annotation
    (DS_PROFILE_FUNCTION)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with jax.profiler.TraceAnnotation(fn.__qualname__):
            return fn(*a, **kw)
    return wrapped


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace for the enclosed region (open in xprof /
    tensorboard-profile)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with optional device fencing — the FPS/UPS
    counter analog (``application.cpp:279-283``)."""

    def __init__(self, fence_every: int = 0):
        self.fence_every = fence_every
        self.times: dict[str, list[float]] = defaultdict(list)
        self._t0: dict[str, float] = {}
        self._count = 0

    @contextlib.contextmanager
    def scope(self, name: str, fence_on: Any = None):
        t0 = time.perf_counter()
        yield
        if fence_on is not None and self.fence_every and \
                self._count % self.fence_every == 0:
            jax.block_until_ready(fence_on)
        self.times[name].append(time.perf_counter() - t0)
        self._count += 1

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            if not ts:
                continue
            out[name] = {
                "mean_ms": 1e3 * sum(ts) / len(ts),
                "last_ms": 1e3 * ts[-1],
                "count": len(ts),
            }
        return out
