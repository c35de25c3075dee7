"""Profiling / tracing utilities (SURVEY §5.1).

The reference has only ad-hoc `time.time()` spans (train_utils.py:39-73,
eval_utils.py:61-73 `--infer_time`). TPU-native equivalents:

* `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable XPlane trace of device execution.
* `StepTimer` — wall-clock per-phase timer with EMA smoothing (the reference's
  `--infer_time` meter, eval_utils.py:40-42).
* `annotate(name)` — `jax.profiler.TraceAnnotation` for custom spans.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA-smoothed phase timer. Use .tick(name) between phases."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.avg = {}
        self._last = time.time()

    def tick(self, name: str) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        prev = self.avg.get(name)
        self.avg[name] = dt if prev is None else (
            self.momentum * prev + (1 - self.momentum) * dt
        )
        return dt

    def reset(self):
        self._last = time.time()

    def summary(self) -> str:
        return "  ".join(f"{k}: {v * 1000:.1f}ms" for k, v in self.avg.items())
