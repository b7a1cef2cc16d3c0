"""Tracing + step-timing observability.

The reference had none of this — only tqdm bars and prints (SURVEY.md §5
"Tracing/profiling: none").  Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
- ``StepTimer``: wall-clock EMA of step latency + throughput, with JSONL
  logging for offline analysis;
- ``annotate``: named trace regions (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional


@contextlib.contextmanager
def trace(logdir, enabled: bool = True):
    """Capture a jax.profiler device trace into ``logdir``."""
    if not enabled:
        yield
        return
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
    """Per-step wall-clock tracker with EMA and optional JSONL sink."""

    def __init__(self, items_per_step: float = 1.0,
                 jsonl_path: Optional[Path] = None, ema: float = 0.9):
        self.items_per_step = items_per_step
        self.ema = ema
        self._avg = None
        self._last = None
        self._step = 0
        self._file = open(jsonl_path, "a") if jsonl_path else None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._last = dt
        self._avg = dt if self._avg is None else \
            self.ema * self._avg + (1 - self.ema) * dt
        self._step += 1
        if self._file:
            self._file.write(json.dumps({
                "step": self._step, "secs": round(dt, 6),
                "items_per_sec": round(self.items_per_step / dt, 3),
            }) + "\n")
            self._file.flush()
        return False

    @property
    def last_secs(self) -> Optional[float]:
        return self._last

    @property
    def avg_secs(self) -> Optional[float]:
        return self._avg

    @property
    def items_per_sec(self) -> Optional[float]:
        return None if not self._avg else self.items_per_step / self._avg

    def close(self):
        if self._file:
            self._file.close()
