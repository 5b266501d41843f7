"""Wall-clock and device timers with an atexit summary.

Equivalent of myutils/timers.py:29-77 (`Timer`/`CudaTimer` context managers
into global defaultdicts + exit report).  `DeviceTimer` blocks on the given
arrays instead of cudaEventSynchronize.
"""
from __future__ import annotations

import atexit
import time
from collections import defaultdict
from typing import Dict, List

_timers: Dict[str, List[float]] = defaultdict(list)


class Timer:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _timers[self.name].append(time.perf_counter() - self.t0)


class DeviceTimer:
    """Times until the device results are actually ready."""

    def __init__(self, name: str, outputs=None):
        self.name = name
        self.outputs = outputs

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def block_on(self, outputs):
        self.outputs = outputs

    def __exit__(self, *exc):
        if self.outputs is not None:
            import jax

            jax.block_until_ready(self.outputs)
        _timers[self.name].append(time.perf_counter() - self.t0)


def timing_report() -> Dict[str, Dict[str, float]]:
    return {
        name: {
            "mean_s": sum(vals) / len(vals),
            "total_s": sum(vals),
            "count": len(vals),
        }
        for name, vals in _timers.items()
        if vals
    }


def _print_report():  # pragma: no cover
    rep = timing_report()
    if rep:
        print("== timing summary ==")
        for name, s in rep.items():
            print(f"  {name}: mean {s['mean_s']*1e3:.2f} ms over {s['count']} calls")


atexit.register(_print_report)
