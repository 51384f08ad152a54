"""Tracing, profiling, and run-metrics logging.

The reference has no observability beyond print statements and SLURM .out
files (SURVEY.md §5). This module provides the TPU-native equivalents:

  * ``trace(...)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the fused train step;
  * ``Throughput`` — trials/sec + steps/sec counters with EMA smoothing;
  * ``MetricsLogger`` — append-only JSONL run log (step, loss, val_loss,
    throughput, wall time) replacing loss-curve-only PNGs
    (``basic_ddm_dc.py:204-205``).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nddms_trace", create_perfetto: bool = False):
    """Profile everything inside the context with jax.profiler."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """EMA throughput counter: call update(n_items) per step."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate: Optional[float] = None
        self._last: Optional[float] = None
        self.total = 0

    def update(self, n_items: int) -> Optional[float]:
        now = time.perf_counter()
        self.total += n_items
        if self._last is not None:
            inst = n_items / max(now - self._last, 1e-9)
            self.rate = inst if self.rate is None else \
                self.ema * self.rate + (1 - self.ema) * inst
        self._last = now
        return self.rate


class MetricsLogger:
    """Append-only JSONL metrics log with wall-clock stamps."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._t0 = time.time()

    def log(self, **record):
        record.setdefault("wall_s", round(time.time() - self._t0, 3))
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
