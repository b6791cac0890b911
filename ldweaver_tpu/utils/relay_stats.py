"""Relay-weather observability: per-pull wall-clock statistics.

Device->host pull latency through the relay'd TPU is WEATHER: the same
code and bytes measured ~1.2 s/round-trip in one session and ~38 s/pull
hours later (CLAUDE.md).  Round-over-round benchmark comparisons can
therefore confuse relay jitter with real regressions (the r4 headline
"regression", VERDICT r4 weak #1).  Every committed artifact now carries
a per-pull histogram (count, total, median, p95, max) so code and
weather separate in one glance.

Usage: the driver installs a `PullRecorder` for the duration of a sweep
(`set_recorder`); every chokepoint that blocks on a device->host pull
wraps the blocking call in `record_pull` seconds.  Thread-safe — pulls
land from drain/pull worker threads.
"""

from __future__ import annotations

import threading
from typing import List, Optional

_LOCK = threading.Lock()
_CUR: List[object] = []  # 0/1-element stack: the active recorder


class PullRecorder:
    def __init__(self) -> None:
        self.durations: List[float] = []

    def add(self, seconds: float) -> None:
        with _LOCK:
            self.durations.append(float(seconds))

    def summary(self, prefix: str = "pull_") -> dict:
        """count / total / median / p95 / max of recorded pull walls."""
        with _LOCK:
            d = sorted(self.durations)
        n = len(d)
        if n == 0:
            return {prefix + "count": 0}
        tot = sum(d)
        med = d[(n - 1) // 2] if n % 2 else 0.5 * (d[n // 2 - 1] + d[n // 2])
        p95 = d[min(n - 1, int(0.95 * (n - 1) + 0.5))]
        return {
            prefix + "count": n,
            prefix + "total_s": round(tot, 2),
            prefix + "median_s": round(med, 3),
            prefix + "p95_s": round(p95, 3),
            prefix + "max_s": round(d[-1], 3),
        }


def set_recorder(rec: Optional[PullRecorder]) -> None:
    with _LOCK:
        _CUR.clear()
        if rec is not None:
            _CUR.append(rec)


def record_pull(seconds: float) -> None:
    """Record one pull's blocking wall on the active recorder (no-op when
    none is installed)."""
    with _LOCK:
        rec = _CUR[0] if _CUR else None
    if rec is not None:
        rec.add(seconds)
