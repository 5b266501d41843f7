"""Running-average metric tracking (pandas-free MetricTracker,
myutils/utils.py:123-144)."""
from __future__ import annotations

from typing import Dict, Iterable, Optional


class MetricTracker:
    def __init__(self, keys: Iterable[str] = (), writer=None):
        self.writer = writer
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        for k in keys:
            self._totals[k] = 0.0
            self._counts[k] = 0

    def reset(self) -> None:
        for k in self._totals:
            self._totals[k] = 0.0
            self._counts[k] = 0

    def update(self, key: str, value: float, n: int = 1) -> None:
        if self.writer is not None:
            self.writer.add_scalar(key, value)
        self._totals[key] = self._totals.get(key, 0.0) + value * n
        self._counts[key] = self._counts.get(key, 0) + n

    def avg(self, key: str) -> float:
        c = self._counts.get(key, 0)
        return self._totals.get(key, 0.0) / c if c else 0.0

    def result(self) -> Dict[str, float]:
        return {k: self.avg(k) for k in self._totals}
