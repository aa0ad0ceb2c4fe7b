"""Tracing / per-stage timing.

The reference's only instrumentation is wall-clock deltas around model.ocr
(app/engine.py:131-135, X-Process-Time in app/middleware.py:74) and inert
--benchmark flags (utils.py:380-383). The TPU build adds:

* StageTimer — cheap per-stage wall-clock aggregation (enabled per pipeline
  via the `benchmark` flag or ONNXOCR_TPU_PROFILE=1), queryable as a dict.
* trace(...) — context manager around jax.profiler for real device traces
  (view in TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Thread-safe accumulator of stage wall times."""

    def __init__(self, enabled: Optional[bool] = None):
        if enabled is None:
            enabled = os.environ.get("ONNXOCR_TPU_PROFILE", "") in (
                "1", "true")
        self.enabled = enabled
        self._lock = threading.Lock()
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._total[name] += dt
                self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                name: {
                    "total_ms": round(self._total[name] * 1000, 2),
                    "count": self._count[name],
                    "mean_ms": round(
                        self._total[name] / max(self._count[name], 1) * 1000,
                        2),
                }
                for name in self._total
            }

    def reset(self):
        with self._lock:
            self._total.clear()
            self._count.clear()


# process-wide default timer (pipeline stages hook into this)
GLOBAL = StageTimer()


class ProgramCapture:
    """Record the last (compiled fn, example args) per named device program
    so a bench can measure true device-busy time: replay the exact
    programs back-to-back with device-resident inputs and divide.

    Wall-clock stage timers can't separate chip time from the ~40 ms-RTT
    tunnel; replaying the captured programs (dispatch is async, one block
    at the end) measures what the chip itself does per image."""

    def __init__(self):
        self.enabled = False
        self._lock = threading.Lock()
        self._calls: Dict[str, tuple] = {}

    def record(self, name: str, fn, args: tuple):
        if not self.enabled:
            return
        with self._lock:
            self._calls[name] = (fn, args)

    def names(self):
        with self._lock:
            return sorted(self._calls)

    def replay_ms(self, name: str, n: int = 5) -> Optional[float]:
        """Mean per-call ms of n back-to-back executions of the captured
        program with device-resident args (one block at the end)."""
        with self._lock:
            entry = self._calls.get(name)
        if entry is None:
            return None
        import jax
        fn, args = entry
        args = tuple(
            jax.tree_util.tree_map(
                lambda a: jax.device_put(a) if hasattr(a, "shape") else a,
                arg) for arg in args)
        out = fn(*args)          # warm + ensure args resident
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1000.0

    def flops(self, name: str) -> Optional[float]:
        """XLA cost-analysis FLOP count of the captured program (one call).
        Re-lowers the same trace, so the compile is a persistent-cache hit.
        With replay_ms this yields achieved FLOP/s → an MFU estimate."""
        with self._lock:
            entry = self._calls.get(name)
        if entry is None:
            return None
        import jax
        fn, args = entry
        try:
            compiled = jax.jit(lambda *a: fn(*a)).lower(*args).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):  # older jax: per-device
                cost = cost[0] if cost else {}
            return float(cost.get("flops", 0.0)) or None
        except Exception:
            return None


CAPTURE = ProgramCapture()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/onnxocr_tpu_trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
