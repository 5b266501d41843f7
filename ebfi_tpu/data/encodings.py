"""Host-side (numpy) event encoders — the parity oracles.

Faithful reimplementations of the reference's CPU encoders
(dataloader/encodings.py) used by the input pipeline when encoding on the
host, and as correctness oracles for the device-side scatter kernels in
:mod:`ebfi_tpu.ops.event_encoding`.

Semantics notes (validated against the torch source):

- `events_to_stack` (encodings.py:307-350) slices each temporal bin
  ``[tstart, tend]`` via binary search over the sorted timestamps.  For
  continuous timestamps this is exactly ``searchsorted(ts, tstart, 'left') :
  searchsorted(ts, tend, 'right')`` — adjacent bins share their boundary
  event if one lands exactly on it (the reference double-counts it too).
- The per-bin accumulation uses weights ``ps * (sign-masked ps)`` =
  ``ps**2`` (encodings.py:333-341), i.e. **counts** for unit polarities, in
  both polarity channels.
- Out-of-range events are zeroed, not clipped (encodings.py:36-41).
- Degenerate streams (<=3 events or all-zero timestamps) produce zeros.
"""
from __future__ import annotations

import numpy as np


def _accumulate(xs, ys, ws, H: int, W: int) -> np.ndarray:
    """Scatter-add ws at integer (ys, xs) into an HxW image; OOB dropped.

    Mirrors `events_to_image` (encodings.py:243-268): out-of-range events are
    zeroed in place (coords and weight set to 0) before the scatter.
    """
    img = np.zeros((H, W), np.float64)
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    oob = (xs < 0) | (xs >= W) | (ys < 0) | (ys >= H)
    xs = np.where(oob, 0, xs)
    ys = np.where(oob, 0, ys)
    ws = np.where(oob, 0.0, ws)
    np.add.at(img, (ys, xs), ws)
    return img


def events_to_stack_np(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    num_bins: int,
    sensor_size: tuple[int, int],
) -> np.ndarray:
    """Per-polarity temporal-bin count stack, (2, num_bins, H, W) float32.

    Bin-edge arithmetic is float64 with the reference's exact op order:
    the reference's loader concatenates xs/ys/ts/ps into one numpy array
    (h5dataset.py:337), which promotes to f64 (H5 stores ts as f64,
    event_packagers.py:47), and only ``ps`` is cast with ``.float()``
    (h5dataset.py:350) — so `events_to_stack` (encodings.py:324-331)
    computes ``dt = ts[-1]-ts[0]+1e-6``, ``delta = dt/B``,
    ``tstart = ts[0]+delta*bi``, ``tend = tstart+delta`` all in f64.
    Bins are CLOSED intervals — an event exactly on a shared f64 edge
    lands in both adjacent bins (left/right binary-search slicing).
    The C++ twin (native/ebfi_host.cpp) shares this contract bit-for-bit;
    the device twin (ops/event_encoding.py) computes edges in f32 (TPU
    native precision) and may assign events within ~1 f32 ulp of an edge
    differently.
    """
    H, W = sensor_size
    ts = np.asarray(ts, np.float64)
    ps = np.asarray(ps, np.float64)
    if ts.sum() == 0 or len(ts) <= 3:
        return np.zeros((2, num_bins, H, W), np.float32)

    dt = np.float64(ts[-1] - ts[0]) + np.float64(1e-6)
    delta = np.float64(dt / np.float64(num_bins))
    out = np.zeros((2, num_bins, H, W), np.float64)
    for bi in range(num_bins):
        tstart = np.float64(ts[0] + delta * np.float64(bi))
        tend = np.float64(tstart + delta)
        beg = int(np.searchsorted(ts, tstart, side="left"))
        end = int(np.searchsorted(ts, tend, side="right"))
        sl = slice(beg, end)
        p = ps[sl]
        w_pos = p * np.where(p < 0, 0.0, p)
        w_neg = p * np.where(p > 0, 0.0, p)
        out[0, bi] = _accumulate(xs[sl].copy(), ys[sl].copy(), w_pos, H, W)
        out[1, bi] = _accumulate(xs[sl].copy(), ys[sl].copy(), w_neg, H, W)
    return out.astype(np.float32)


def normalize_event_ts(ts: np.ndarray) -> np.ndarray:
    """Relative-time normalization applied before stacking
    (dataloader/h5dataset.py:335): ``(ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)``."""
    ts = np.asarray(ts, np.float64)
    return (ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)
