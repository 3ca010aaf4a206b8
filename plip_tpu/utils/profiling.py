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
- :func:`parse_device_trace` — decompose a ``jax.profiler`` trace into
  per-scan (``while`` op) device-time groups + outside-scan remainder, the
  method that produced the round-3 train-step decompositions (PERF.md).
  Works through the axon tunnel (parses the ``*.trace.json.gz`` the
  profiler writes; no TensorBoard needed).
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


def parse_device_trace(
    path: str,
    n_steps: int = 1,
    device: str = "/device:TPU:0",
    step_prefix: str = "jit_",
) -> Dict:
    """Decompose a ``jax.profiler`` trace into per-scan device-time groups.

    ``path``: a ``*.trace.json.gz`` file, or a profiler logdir (the newest
    ``plugins/profile/*/*.trace.json.gz`` under it is used). ``n_steps``:
    how many identical steps ran inside the trace — all reported times are
    normalized to ms/step. Returns::

        {"step_total_ms": float,      # sum of {step_prefix}* op time
         "groups": {while_name: {"total_ms": float,
                                 "ops": [(op_name, ms), ...]}},  # per scan
         "outside_ms": float}         # step total - all scan groups

    Each ``while`` op on the device timeline is one ``lax.scan``/
    ``while_loop`` (e.g. a tower's layer stack); ops nested inside its time
    span on the same thread are attributed to it. Every occurrence across
    the ``n_steps`` accumulates, hence the normalization.
    """
    import glob
    import gzip
    from collections import Counter, defaultdict

    if os.path.isdir(path):
        cands = sorted(glob.glob(
            os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")))
        if not cands:
            raise FileNotFoundError(f"no trace.json.gz under {path}")
        path = cands[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
    dev = [e for e in ev if e.get("ph") == "X" and "dur" in e
           and names.get(e["pid"]) == device]
    whiles = sorted((e for e in dev if e["name"].startswith("while")),
                    key=lambda e: e["ts"])
    per: Dict[str, Counter] = defaultdict(Counter)
    tot_w: Dict[str, float] = defaultdict(float)
    for w in whiles:
        t0, t1 = w["ts"], w["ts"] + w["dur"]
        tot_w[w["name"]] += w["dur"]
        for e in dev:
            if e is w or e["tid"] != w["tid"]:
                continue
            if (e["ts"] >= t0 and e["ts"] + e["dur"] <= t1
                    and not e["name"].startswith("while")):
                per[w["name"]][e["name"]] += e["dur"]
    k = n_steps * 1e3  # occurrences over n_steps, us -> ms
    step_total = sum(e["dur"] for e in dev
                     if e["name"].startswith(step_prefix)) / k
    groups = {
        wn: {"total_ms": tot_w[wn] / k,
             "ops": [(n, d / k) for n, d in per[wn].most_common()]}
        for wn in tot_w
    }
    return {
        "step_total_ms": step_total,
        "groups": groups,
        "outside_ms": step_total - sum(g["total_ms"] for g in groups.values()),
    }


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
