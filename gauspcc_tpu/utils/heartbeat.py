"""Liveness heartbeat for long device jobs.

External stall watchdogs (scripts/soak_loop.sh, scripts/codec_train_loop.sh)
kill a run whose log goes quiet for too long. But XLA recompiles — raster
cap growth (models/hac/pipeline.py::_adapt_caps), anchor-count bucket
crossings after densification, the first jit of a new program — block the
training loop for minutes with no output. Round 4's flagship scene run was
killed by its own watchdog mid-recompile exactly this way
(runs/soak_hac_r4c.log: "attempt 1 stalled 600s, killing pid" at the
K=1024 cap-growth recompile).

The fix: the training process maintains a heartbeat FILE the watchdog
stats instead of (or in addition to) the log:

  - ``beat()``: cheap mtime bump, called once per completed step;
  - ``guard()``: a context manager that keeps a background thread
    touching the file while a known-blocking section is in flight (a
    step call that may recompile, an eval render sweep, encode/decode,
    scene construction).

A guard's thread stops after ``max_s`` seconds even if the section never
exits, so a genuinely hung device (tunnel drop, wedged backend) is still
detected by the watchdog within ``max_s + STALL_S`` — bounded, instead of
never. Outside guard sections the file goes quiet immediately on a hang.
"""

from __future__ import annotations

import contextlib
import os
import threading


class Heartbeat:
    """Touches ``path`` to prove liveness to an external stall watchdog."""

    def __init__(self, path: str, interval: float = 45.0,
                 max_s: float = 1500.0):
        self.path = path
        self.interval = float(interval)
        self.max_s = float(max_s)
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self.beat()

    def beat(self) -> None:
        with open(self.path, "a"):
            pass
        os.utime(self.path, None)

    @contextlib.contextmanager
    def guard(self, label: str = ""):
        """Keep the heartbeat alive through a blocking section, for at
        most ``max_s`` seconds (bounded so true hangs still surface)."""
        stop = threading.Event()
        budget = self.max_s

        def _run():
            waited = 0.0
            while waited < budget and not stop.wait(self.interval):
                self.beat()
                waited += self.interval

        t = threading.Thread(target=_run, daemon=True,
                             name=f"heartbeat-guard:{label}")
        t.start()
        try:
            yield
        finally:
            stop.set()
            t.join(timeout=5.0)
            self.beat()


class NullHeartbeat:
    """No-op stand-in so call sites never branch on None."""

    def beat(self) -> None:
        pass

    @contextlib.contextmanager
    def guard(self, label: str = ""):
        yield


class DivergenceMonitor:
    """Abort decision for the clean-render canary.

    Round 4's 30k soak collapsed by iter ~16k yet burned chip until 27.4k
    because nothing acted on the canary (VERDICT r4 weak #5). This tracks
    the running max of a quality scalar (clean held-out PSNR) and returns
    True — abort — once the current value falls more than ``drop_db``
    below that max. ``warmup`` readings are always accepted so the noisy
    first checkpoints can't trip it.
    """

    def __init__(self, drop_db: float = 3.0, warmup: int = 1):
        self.drop_db = float(drop_db)
        self.warmup = int(warmup)
        self.best = float("-inf")
        self.n = 0
        self.last = None

    def update(self, value: float) -> bool:
        self.n += 1
        self.last = float(value)
        if self.last > self.best:
            self.best = self.last
        if self.n <= self.warmup:
            return False
        return (self.best - self.last) > self.drop_db
