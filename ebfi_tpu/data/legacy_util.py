"""Legacy event-frame utilities (dataloader/util.py equivalents).

The reference carries numpy helpers predating the stack encoder — kept for
API completeness (they are off the main path there too):

- :func:`event2frame` — pre/post-reference-time two-channel polarity count
  frames with optional uniform event-noise injection (util.py:67-116).
- :func:`filter_events` / :func:`filter_events_by_space` — time- and
  coordinate-window selection of an event list (util.py:119-145).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def event2frame(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    resolution: Tuple[int, int],
    ref_time: float,
    noise_fraction: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """(2, 2, H, W): [pre/post reference time] x [positive/negative counts].

    Optionally injects `noise_fraction * N` uniform random events (the
    reference's data-noise fault injection, util.py:85-104).
    """
    H, W = resolution
    rng = rng or np.random.default_rng()
    if noise_fraction > 0 and len(ts):
        n = int(noise_fraction * len(ts))
        xs = np.concatenate([xs, rng.integers(0, W, n)])
        ys = np.concatenate([ys, rng.integers(0, H, n)])
        ts = np.concatenate([ts, rng.uniform(ts.min(), ts.max(), n)])
        ps = np.concatenate([ps, rng.choice([-1.0, 1.0], n)])

    out = np.zeros((2, 2, H, W), np.float32)
    xi = xs.astype(np.int64)
    yi = ys.astype(np.int64)
    ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    for half, sel_t in ((0, ts <= ref_time), (1, ts > ref_time)):
        for pol, sel_p in ((0, ps > 0), (1, ps < 0)):
            sel = ok & sel_t & sel_p
            np.add.at(out[half, pol], (yi[sel], xi[sel]), 1.0)
    return out


def filter_events(xs, ys, ts, ps, t0: float, t1: float):
    """Keep events with t in [t0, t1) (util.py:119-131)."""
    sel = (ts >= t0) & (ts < t1)
    return xs[sel], ys[sel], ts[sel], ps[sel]


def filter_events_by_space(xs, ys, ts, ps, x0: int, x1: int, y0: int, y1: int):
    """Keep events inside the [x0,x1) x [y0,y1) window, re-origined
    (util.py:134-145)."""
    sel = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)
    return xs[sel] - x0, ys[sel] - y0, ts[sel], ps[sel]
