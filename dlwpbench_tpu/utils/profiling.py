"""Tracing / profiling as a first-class feature.

The reference's observability is minimal (NVTX ranges in the distributed FFT,
wall-clock prints; SURVEY 5).  Here:

- `trace(dir)` — context manager around `jax.profiler.trace` producing a
  TensorBoard-loadable device trace (the TPU answer to NVTX);
- `annotate(name)` — `jax.profiler.TraceAnnotation` for custom ranges;
- `StepTimer` — steady-state step timing with compile-time exclusion and
  percentile summaries (the methodology bench.py uses, reusable in training).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Collects per-step wall times; first `skip` steps (compiles) excluded."""

    skip: int = 1
    _times: list = field(default_factory=list)
    _seen: int = 0
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip:
            self._times.append(dt)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "median_s": float(np.median(t)),
            "p90_s": float(np.percentile(t, 90)),
            "total_s": float(t.sum()),
        }
