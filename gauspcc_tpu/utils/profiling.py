"""Tracing / profiling as a first-class metrics module.

The reference instruments with ad-hoc `torch.cuda.synchronize(); time.time()`
pairs and CUDA events (SURVEY.md §5.1). Here: named phase timers that
block on device work, per-phase accumulators (the HAC++-style stage
breakdown, HAC-plus/scene/gaussian_model.py:1211-1218), peak-memory
reporting, and an opt-in jax.profiler trace context for XLA-level timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating named timers. `with timer.phase("feat"): ...` blocks on
    outstanding device work at both edges so wall-clock is attributable."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        _block_on_device()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _block_on_device()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        parts = [
            f"{k} {self.totals[k]:.3f}s/{self.counts[k]}x"
            for k in sorted(self.totals)
        ]
        return ", ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def _block_on_device():
    try:
        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:
        pass


def device_memory_stats() -> dict:
    """Per-device {bytes_in_use, peak_bytes_in_use} when the backend
    exposes them (TPU does; CPU returns {})."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
