"""Tracing / profiling hooks.

The reference has no profiler (SURVEY.md section 5.1 — tqdm bars only);
this module adds the TPU-native equivalents:

- ``StepTimer``: host-side per-step wall-clock stats (p50/p90/max,
  samples/sec), cheap enough to leave on in production.
- ``trace``: a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable XPlane trace of the device timeline.
- ``annotate``: named trace spans (jax.profiler.TraceAnnotation) for
  engine phases so device ops attribute to train/val/test regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self, capacity: int = 10000):
        self._times: List[float] = []
        self._capacity = capacity
        self._last: Optional[float] = None

    def tick(self) -> None:
        """Call once per step (after the step's host sync)."""
        now = time.perf_counter()
        if self._last is not None and len(self._times) < self._capacity:
            self._times.append(now - self._last)
        self._last = now

    def reset(self) -> None:
        self._times.clear()
        self._last = None

    def stats(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        out = {
            "steps": float(len(t)),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p90": float(np.percentile(t, 90) * 1e3),
            "step_ms_max": float(t.max() * 1e3),
        }
        if batch_size:
            out["samples_per_sec"] = float(batch_size / np.median(t))
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """Device-timeline trace around a code region (view in TensorBoard or
    xprof):  with profiling.trace("/tmp/trace"): run_steps()."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span attributing device ops to an engine phase."""
    return jax.profiler.TraceAnnotation(name)
