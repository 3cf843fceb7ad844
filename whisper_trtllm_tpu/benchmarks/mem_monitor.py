"""Peak device-memory monitor for benchmark runs.

Analog of the reference's pynvml polling subprocess (reference:
benchmarks/mem_monitor.py:1-26 — a fork polling
nvmlDeviceGetMemoryInfo every 100 ms until the benchmark signals it to
stop, returning peak used GiB). On TPU the source of truth is the
runtime's own allocator statistics (`Device.memory_stats()`:
bytes_in_use / peak_bytes_in_use), so no subprocess is needed — a daemon
thread samples, and where the backend already tracks a peak we read it
directly.

Not every backend exposes memory_stats (the CPU backend and some tunneled
TPU setups return None/raise); the monitor then degrades to reporting -1
like a missing pynvml would, rather than failing the benchmark.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax


def get_memory_info(device=None):
    """(total_gib, used_gib, peak_gib) for ``device`` (default: first
    device), NaN-free; (-1.0, -1.0, -1.0) when the backend keeps no stats
    (reference: mem_monitor.py:6-11 get_memory_info)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if not stats:
        return -1.0, -1.0, -1.0
    gib = 1024.0 ** 3
    total = round(stats.get("bytes_limit", 0) / gib, 2)
    used = round(stats.get("bytes_in_use", 0) / gib, 2)
    peak = round(stats.get("peak_bytes_in_use", 0) / gib, 2)
    return total, used, peak


class MemoryMonitor:
    """Sample device memory on a daemon thread for the duration of a
    benchmark region (reference: mem_monitor.py:14-26 mem_monitor — queue
    handshake replaced by start()/stop()).

    >>> mon = MemoryMonitor().start()
    >>> ...   # timed benchmark work
    >>> peak_gib = mon.stop()
    """

    def __init__(self, device=None, interval: float = 0.1):
        self.device = device or jax.devices()[0]
        self.interval = interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.peak_gib = -1.0

    def _run(self):
        while not self._stop.is_set():
            _, used, peak = get_memory_info(self.device)
            self.peak_gib = max(self.peak_gib, peak if peak > 0 else used)
            time.sleep(self.interval)

    def start(self) -> "MemoryMonitor":
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> float:
        """Stop sampling; return peak used GiB seen (-1.0 if the backend
        never reported)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        # one final synchronous sample so even sub-interval regions and
        # allocator-tracked peaks are captured
        _, used, peak = get_memory_info(self.device)
        self.peak_gib = max(self.peak_gib, peak if peak > 0 else used)
        return self.peak_gib
