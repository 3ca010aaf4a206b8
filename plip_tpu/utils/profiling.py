"""Tracing / profiling / observability.

The reference has none of this (SURVEY.md §5: tqdm bars and wall-clock
directory names only). Here:

- :class:`ThroughputMeter` — rolling items/sec + p50/p95 step latency.
- :func:`trace` — context manager around ``jax.profiler`` (TensorBoard trace)
  that degrades to a no-op wall-clock timer where the profiler is unsupported
  (e.g. the axon remote tunnel).
- :class:`MetricLogger` — structured JSONL metric sink (step, wall time,
  arbitrary scalars), the machine-readable counterpart of the reference's
  ``logging.info`` strings.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Dict, Optional


class ThroughputMeter:
    def __init__(self, window: int = 100):
        self.window = window
        self.times = deque(maxlen=window)
        self.counts = deque(maxlen=window)
        self._last: Optional[float] = None
        self.total_items = 0
        self.total_time = 0.0

    def start(self) -> None:
        self._last = time.perf_counter()

    def step(self, n_items: int) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            self.counts.append(n_items)
            self.total_time += dt
            self.total_items += n_items
        self._last = now

    @property
    def items_per_sec(self) -> float:
        t = sum(self.times)
        return sum(self.counts) / t if t else 0.0

    def latency_percentile(self, q: float) -> float:
        if not self.times:
            return 0.0
        xs = sorted(self.times)
        idx = min(int(q / 100.0 * len(xs)), len(xs) - 1)
        return xs[idx]

    def summary(self) -> Dict[str, float]:
        return {
            "items_per_sec": self.items_per_sec,
            "p50_latency_s": self.latency_percentile(50),
            "p95_latency_s": self.latency_percentile(95),
            "total_items": self.total_items,
            "total_time_s": self.total_time,
        }


@contextlib.contextmanager
def trace(logdir: Optional[str] = None, name: str = "plip_tpu"):
    """jax.profiler trace if available; always yields a dict that gains
    'wall_time_s' on exit."""
    import jax

    info: Dict[str, float] = {}
    t0 = time.perf_counter()
    started = False
    if logdir:
        try:
            jax.profiler.start_trace(logdir)
            started = True
        except Exception:
            started = False
    try:
        yield info
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        info["wall_time_s"] = time.perf_counter() - t0


class MetricLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **scalars) -> None:
        rec = {"step": int(step), "time_s": time.time() - self._t0}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()
