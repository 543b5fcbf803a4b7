"""Profiling: wall-time spans + on-device traces.

Covers the reference's observability hooks (SURVEY.md section 5): trl's
``profiling_decorator``/context (trl/extras/profiling.py, wall-time spans
pushed to the metrics sink) plus TPU-native ``jax.profiler`` trace capture
for xprof -- the tracing capability the CUDA reference lacks.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Callable

# span name -> list of durations (seconds); drained by the metrics logger
_SPANS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def profiling_context(name: str):
    """Record the wall time of a block under ``profiling/<name>``."""
    start = time.perf_counter()
    try:
        yield
    finally:
        _SPANS[name].append(time.perf_counter() - start)


def profiling_decorator(fn: Callable) -> Callable:
    """Wall-time every call under the function's qualified name."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with profiling_context(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


def drain_profiling_metrics() -> dict[str, float]:
    """Mean duration per span since the last drain (wandb-style keys)."""
    out = {
        f"profiling/Time taken: {name}": sum(vals) / len(vals)
        for name, vals in _SPANS.items()
        if vals
    }
    _SPANS.clear()
    return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
