"""JSONL metrics logging + step timing + profiler hooks.

Replaces the reference's print statements, NaN-poisoned .mat loss dumps
(trainer.py:163-164, SURVEY.md §2.2 #1), and validation_results.txt appends
with one structured JSONL stream per run plus optional jax.profiler traces
(SURVEY.md §5 tracing/profiling).
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    """Append-only JSONL logger; one record per event, host-side scalars only."""

    def __init__(self, path: Optional[str] = None, *, stdout: bool = True,
                 process_index: Optional[int] = None):
        self.path = path
        self.stdout = stdout
        idx = jax.process_index() if process_index is None else process_index
        self.enabled = idx == 0  # process-0 gating for multi-host
        if self.enabled and path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, event: str, **fields: Any) -> None:
        if not self.enabled:
            return
        rec: Dict[str, Any] = {"event": event, "time": time.time()}
        for k, v in fields.items():
            if hasattr(v, "item"):
                try:
                    v = v.item()
                except Exception:
                    v = str(v)
            if isinstance(v, float) and not math.isfinite(v):
                # plain json.dumps would emit literal NaN/Infinity — invalid
                # strict JSON that jq/pandas reject (and the very failure
                # mode the reference's .mat dumps had, module docstring)
                v = None
            rec[k] = v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self.stdout:
            print(line, flush=True)

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None


class StepTimer:
    """Wall-clock throughput meter (images/sec, steps/sec) with warmup skip."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.items = 0
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
            self.items += n_items
        return dt

    @property
    def steps_timed(self) -> int:
        return max(0, self.count - self.warmup)

    def mean_step_time(self) -> float:
        return self.total / self.steps_timed if self.steps_timed else float("nan")

    def items_per_sec(self) -> Optional[float]:
        """Throughput over the timed (post-warmup) window, from the actual
        per-call item counts — correct for variable batch sizes."""
        return self.items / self.total if self.total else None


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a region; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
