"""Tag-based wall-clock timer + jax.profiler trace helper.

Analog of the reference's Timer (reference: tensorrt_llm/profiler.py:4-55)
plus a TPU-native kernel tracer the reference lacks (it relies on external
nsight; SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timer:
    def __init__(self):
        self._start: Dict[str, float] = {}
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    def start(self, tag: str) -> None:
        self._start[tag] = time.perf_counter()

    def stop(self, tag: str) -> float:
        elapsed = time.perf_counter() - self._start.pop(tag)
        self._total[tag] += elapsed
        self._count[tag] += 1
        return elapsed

    @contextlib.contextmanager
    def time(self, tag: str) -> Iterator[None]:
        self.start(tag)
        try:
            yield
        finally:
            self.stop(tag)

    def elapsed(self, tag: str) -> float:
        return self._total[tag]

    def reset(self, tag: Optional[str] = None) -> None:
        if tag is None:
            self._total.clear()
            self._count.clear()
            self._start.clear()
        else:
            self._total.pop(tag, None)
            self._count.pop(tag, None)

    def summary(self) -> str:
        lines = ["Profile results:"]
        for tag, total in sorted(self._total.items()):
            n = self._count[tag]
            lines.append(
                f"  {tag}: total {total*1e3:.2f} ms over {n} calls "
                f"(mean {total/max(n,1)*1e3:.2f} ms)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
