"""Auxiliary subsystems: dedup logging, progress, online stats, checkpoints.

Host-side ports of the reference's observability machinery (SURVEY §5):

* ``AccumulatedLogHandler`` — the reference's AccumulatedLogger
  (base/AccumulatedLogger.h:31-141): dedups repeated messages with
  occurrence counts and flushes periodically, so per-triangle warnings
  ("zero-area face") don't spam.
* ``ProgressBar`` — rate-limited console bar (base/ProgressBar.h:29-65).
* ``RunningStats`` — Welford/Knuth online mean/variance
  (base/RunningStats.h:9-69), used by the adaptive-RR integrator variant.
* ``save_checkpoint``/``load_checkpoint`` — film + sample-count
  checkpointing for long preemptible renders, the capability the reference's
  multi-pass scaffolding (TileScheduler.h:12-16) never grew into.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import threading
import time

import numpy as np

__all__ = ["AccumulatedLogHandler", "ProgressBar", "RunningStats",
           "Stopwatch", "save_checkpoint", "load_checkpoint"]


class AccumulatedLogHandler(logging.Handler):
    """Dedup log handler with periodic background flush (750 ms, matching
    AccumulatedLogger.h:38)."""

    def __init__(self, stream=None, flush_interval: float = 0.75):
        super().__init__()
        self.stream = stream or sys.stderr
        self.flush_interval = flush_interval
        self._lock2 = threading.Lock()
        self._counts: dict[str, int] = {}
        self._levels: dict[str, int] = {}
        self._timer: threading.Timer | None = None

    def emit(self, record: logging.LogRecord) -> None:
        msg = self.format(record)
        with self._lock2:
            self._counts[msg] = self._counts.get(msg, 0) + 1
            self._levels[msg] = record.levelno
            if self._timer is None:
                self._timer = threading.Timer(self.flush_interval, self.flush_accumulated)
                self._timer.daemon = True
                self._timer.start()

    def flush_accumulated(self) -> None:
        with self._lock2:
            counts, self._counts = self._counts, {}
            self._levels = {}
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
        for msg, count in counts.items():
            suffix = f" (x{count})" if count > 1 else ""
            print(f"{msg}{suffix}", file=self.stream)

    def close(self) -> None:
        self.flush_accumulated()
        super().close()


class ProgressBar:
    """Rate-limited console progress (ProgressBar.h:29-65, 1 Hz redraw)."""

    def __init__(self, total: int, label: str = "items", width: int = 50,
                 stream=None, min_interval: float = 1.0):
        self.total = max(total, 1)
        self.label = label
        self.width = width
        self.stream = stream or sys.stderr
        self.min_interval = min_interval
        self._count = 0
        self._last_draw = 0.0
        self._lock = threading.Lock()

    def update(self, n: int = 1) -> None:
        with self._lock:
            self._count += n

    def draw(self, force: bool = False) -> None:
        now = time.monotonic()
        if not force and now - self._last_draw < self.min_interval:
            return
        self._last_draw = now
        frac = min(self._count / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "*" * filled + "-" * (self.width - filled)
        print(f"\r{int(frac * 100):3d}% |{bar}| {self._count}/{self.total} "
              f"{self.label}", end="", file=self.stream, flush=True)

    def finish(self) -> None:
        self._count = self.total
        self.draw(force=True)
        print(file=self.stream)


class RunningStats:
    """Welford online mean/variance (RunningStats.h:25-41); vectorized —
    push accepts arrays and tracks elementwise stats."""

    def __init__(self):
        self.n = 0
        self._mean = 0.0
        self._m2 = 0.0

    def push(self, x) -> None:
        x = np.asarray(x, np.float64)
        self.n += 1
        delta = x - self._mean
        self._mean = self._mean + delta / self.n
        self._m2 = self._m2 + delta * (x - self._mean)

    def mean(self):
        return self._mean

    def variance(self):
        return self._m2 / (self.n - 1) if self.n > 1 else 0.0

    def size(self) -> int:
        return self.n


class Stopwatch:
    """Wall-clock stopwatch with the reference's hh:mm:ss.cc print format
    (Stopwatch.h:47-60)."""

    def __init__(self):
        self.start = time.monotonic()
        self.elapsed = None

    def stop(self) -> float:
        self.elapsed = time.monotonic() - self.start
        return self.elapsed

    def __str__(self) -> str:
        e = self.elapsed if self.elapsed is not None else time.monotonic() - self.start
        hh, rem = divmod(int(e), 3600)
        mm, ss = divmod(rem, 60)
        cc = int((e - int(e)) * 100)
        return f"{hh:02d}:{mm:02d}:{ss:02d}.{cc:02d}"


def save_checkpoint(path, film_sum: np.ndarray, samples_done: int,
                    meta: dict | None = None) -> None:
    """Save an accumulated (unaveraged) film + spp count; resumable."""
    np.savez(path, film_sum=np.asarray(film_sum, np.float32),
             samples_done=np.int64(samples_done),
             meta=json.dumps(meta or {}))


def load_checkpoint(path):
    """→ (film_sum, samples_done, meta) or None if absent."""
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    return z["film_sum"], int(z["samples_done"]), json.loads(str(z["meta"]))
