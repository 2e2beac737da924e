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
        self._steps: List[int] = []
        self._capacity = capacity
        self._last: Optional[float] = None

    def tick(self, n_steps: int = 1) -> None:
        """Call once per DISPATCH (after its host sync); ``n_steps`` is the
        optimizer steps that dispatch covered (>1 for the fused multi-step
        path)."""
        now = time.perf_counter()
        if self._last is not None and len(self._times) < self._capacity:
            self._times.append(now - self._last)
            self._steps.append(n_steps)
        self._last = now

    def reset(self) -> None:
        self._times.clear()
        self._steps.clear()
        self._last = None

    def stats(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        k = np.asarray(self._steps)
        per_step = t / k                       # normalized per optimizer step
        out = {
            "steps": float(k.sum()),
            "step_ms_p50": float(np.percentile(per_step, 50) * 1e3),
            "step_ms_p90": float(np.percentile(per_step, 90) * 1e3),
            "step_ms_max": float(per_step.max() * 1e3),
        }
        if batch_size:
            out["samples_per_sec"] = float(batch_size * k.sum() / t.sum())
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
