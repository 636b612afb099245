"""Profiling and per-phase timing.

The reference's observability is a wall-clock `Timer` logged per iteration
(`util/timer.py:9`, SURVEY §5.1). Here:

* `PhaseTimer` — named per-phase (sample / env / update) accumulators that
  agents can wrap around their hot sections; `summary()` yields
  seconds-per-phase and derived counters (env-steps/s, denoise-steps/s).
* `trace(logdir)` — context manager around `jax.profiler` trace capture for
  TensorBoard/XProf; safe no-op if profiling is unavailable.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.acc = defaultdict(float)
        self.counts = defaultdict(int)
        self._start = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self, reset: bool = True) -> dict:
        out = {f"time/{k}": v for k, v in self.acc.items()}
        for k, n in self.counts.items():
            if n:
                out[f"time/{k}_per_call"] = self.acc[k] / n
        if reset:
            self.acc.clear()
            self.counts.clear()
            self._start.clear()
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block (XProf format)."""
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
