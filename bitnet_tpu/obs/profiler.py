"""Inference profiler: phase timers + chrome://tracing export + XLA traces.

Rebuild of the reference's per-layer profiler
(``bitnet-inference/src/profiler.rs:1-25`` — per-layer timing, memory,
chrome-trace JSON export) for the TPU execution model:

- **Host phases** (``Profiler.phase``): prefill / decode-step / sampling /
  detokenize spans, exported as a chrome://tracing JSON (load in
  ``chrome://tracing`` or Perfetto).
- **Device time** comes from ``jax.profiler`` (``device_trace``): XLA
  already annotates every fused kernel; we just own the session. Per-layer
  device attribution falls out of the ``lax.scan`` structure.
- **Memory** via ``jax.local_devices()[0].memory_stats()`` when the
  backend exposes it.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time


class Profiler:
    """Thread-safe phase profiler with chrome-trace export."""

    def __init__(self):
        self._events: list[dict] = []
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()
        self.enabled = True

    @contextlib.contextmanager
    def phase(self, name: str, **args):
        """Time a host-side phase: ``with prof.phase("prefill"): ...``"""
        if not self.enabled:
            yield
            return
        start = time.perf_counter()
        try:
            yield
        finally:
            end = time.perf_counter()
            with self._lock:
                self._events.append({
                    "name": name,
                    "ph": "X",                      # complete event
                    "ts": (start - self._t0) * 1e6,  # µs
                    "dur": (end - start) * 1e6,
                    "pid": os.getpid(),
                    "tid": threading.get_ident() % 100000,
                    "args": args,
                })

    def instant(self, name: str, **args) -> None:
        if not self.enabled:
            return
        with self._lock:
            self._events.append({
                "name": name, "ph": "i",
                "ts": (time.perf_counter() - self._t0) * 1e6,
                "pid": os.getpid(),
                "tid": threading.get_ident() % 100000,
                "s": "t", "args": args,
            })

    # -- reporting ------------------------------------------------------------
    def summary(self) -> dict:
        """Aggregate totals per phase name (count, total_ms, mean_ms)."""
        agg: dict[str, list[float]] = {}
        with self._lock:
            for e in self._events:
                if e["ph"] == "X":
                    agg.setdefault(e["name"], []).append(e["dur"] / 1e3)
        return {
            name: {
                "count": len(ds),
                "total_ms": round(sum(ds), 3),
                "mean_ms": round(sum(ds) / len(ds), 3),
                "max_ms": round(max(ds), 3),
            }
            for name, ds in sorted(agg.items())
        }

    def export_chrome_trace(self, path: str) -> None:
        """chrome://tracing / Perfetto-compatible JSON (profiler.rs parity)."""
        with self._lock:
            events = list(self._events)
        with open(path, "w") as f:
            json.dump({"traceEvents": events,
                       "displayTimeUnit": "ms"}, f)

    def reset(self) -> None:
        with self._lock:
            self._events.clear()
            self._t0 = time.perf_counter()


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA/TPU device trace session (open with TensorBoard or Perfetto).

    Equivalent of the reference's GPU continuous profiling
    (``bitnet-gpu-hal/src/continuous_profiling.rs``) — but the TPU runtime
    records every kernel natively; no per-op instrumentation needed.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort HBM stats for the first local device."""
    import jax

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {"available": False, "platform": dev.platform}
    return {
        "available": True,
        "platform": dev.platform,
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
