"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
wall-clock prints; the TPU build exposes jax.profiler traces + step timers).

Usage:
    with trace_if_enabled():          # honors DT4IR_TRACE_DIR
        run_workload()

    timer = StepTimer()
    for batch in ...:
        with timer:
            step(...)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, List, Optional

import numpy as np

TRACE_ENV_VAR = "DT4IR_TRACE_DIR"


@contextlib.contextmanager
def trace_if_enabled(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard) when a
    trace directory is given or DT4IR_TRACE_DIR is set; no-op otherwise."""
    trace_dir = trace_dir or os.environ.get(TRACE_ENV_VAR)
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-span inside an active trace (maps to TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer with percentile summary — the structured
    replacement for the reference's ad-hoc time.time() prints
    (train.py:139,159-161; eval.py:110,132,140)."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0 = 0.0

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }
