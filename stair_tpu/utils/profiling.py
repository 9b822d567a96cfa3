"""First-class profiling: XLA traces, step timing, device memory.

The reference has no tracing/profiling at all (SURVEY §5: wall-clock prints
only). Here:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (XLA ops, fusion, HBM traffic) for a chosen
    window of steps;
  * :class:`StepTimer` — cheap EMA step timing with percentile summaries;
  * :func:`device_memory_report` — per-device live-buffer stats.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace into ``log_dir`` (view in TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class GCTimer:
    """Accumulate CPython garbage-collection pause time via gc.callbacks.

    Host stalls in an async-dispatch training loop are invisible to device
    profilers; gen-2 collections over a large live heap (datasets, packed
    batches) are a classic periodic-stall suspect, so the trainer reports
    the pause total per metrics window (``perf/gc_ms``)."""

    def __init__(self):
        import gc

        self.total = 0.0
        self.collections = 0
        self._t0 = None
        self._registered = True
        gc.callbacks.append(self._cb)

    def close(self):
        """Deregister from gc.callbacks. Without this every constructed
        timer stays registered for process lifetime, so repeated trainer
        construction (tests, drivers) accumulates callbacks (ADVICE r4)."""
        import gc

        if self._registered:
            try:
                gc.callbacks.remove(self._cb)
            except ValueError:
                pass
            self._registered = False

    def __del__(self):
        self.close()

    def _cb(self, phase, info):
        if phase == "start":
            self._t0 = time.perf_counter()
        elif self._t0 is not None:
            self.total += time.perf_counter() - self._t0
            self.collections += 1
            self._t0 = None

    def take(self) -> tuple[float, int]:
        """Return (seconds, collections) since the last take()."""
        out = (self.total, self.collections)
        self.total, self.collections = 0.0, 0
        return out


def async_fetch(tree):
    """Start device->host copies for every array in ``tree`` without
    blocking: a later ``jax.device_get`` then finds the data already on
    host instead of paying one blocking round trip PER LEAF (through a
    tunneled device link that per-leaf sync is the dominant stall)."""
    def start(x):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
        return x

    return jax.tree_util.tree_map(start, tree)


class StepTimer:
    """Track step wall-times; report mean/p50/p99."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                del self.times[0]
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps_per_sec": 1.0 / float(arr.mean()),
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p99": float(np.percentile(arr, 99) * 1e3),
        }


def device_memory_report() -> list[dict]:
    """Live-buffer statistics per device (empty if backend lacks support)."""
    out = []
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out.append({
                "device": str(dev),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            })
    return out
