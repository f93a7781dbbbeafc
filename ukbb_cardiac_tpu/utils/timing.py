"""Structured per-stage timing and optional device profiling.

The reference's only observability is wall-clock prints scattered through
the scripts (``deploy_network.py:52,86,118-120,218-225``;
``train_network.py:257,311`` — SURVEY.md §5 "tracing/profiling").  This
module replaces them with one structured timer: named spans, aggregated
stats, JSON export, and an optional ``jax.profiler`` trace for device
timelines.
"""

from __future__ import annotations

import contextlib
import threading
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Hierarchical named wall-clock spans with aggregation.

    >>> timer = StageTimer()
    >>> with timer.span("segment"):
    ...     ...
    >>> timer.summary()["segment"]["total_s"]
    """

    def __init__(self):
        self._records = defaultdict(list)
        # per-thread span stack: run_fleet drives subjects from a thread
        # pool, and a shared stack would interleave span names across
        # threads; records stay shared (guarded) so summary() sees all
        self._local = threading.local()
        self._lock = threading.Lock()

    @property
    def _stack(self):
        if not hasattr(self._local, "stack"):
            self._local.stack = []
        return self._local.stack

    @contextlib.contextmanager
    def span(self, name: str):
        stack = self._stack
        full = "/".join(stack + [name])
        stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            stack.pop()
            with self._lock:
                self._records[full].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        with self._lock:
            self._records[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        # snapshot under the lock: fleet worker threads may open new span
        # names while a reporter iterates
        with self._lock:
            records = {name: list(vals) for name, vals in self._records.items()}
        out = {}
        for name, vals in records.items():
            out[name] = {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / len(vals),
                "max_s": max(vals),
            }
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name}: n={s['count']} total={s['total_s']:.3f}s "
                         f"mean={s['mean_s']:.3f}s max={s['max_s']:.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Optional ``jax.profiler`` trace (viewable in TensorBoard/XProf).

    No-op when log_dir is falsy, so callers can thread a flag through.
    """
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
    except Exception as e:  # tracing is best-effort: never fail the deploy
        print(f"Warning: device trace unavailable ({e}); continuing.")
        yield
        return
    try:
        yield
    finally:
        jax.profiler.stop_trace()
