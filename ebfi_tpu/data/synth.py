"""Synthetic clip generation: frames + ESIM-style events -> schema H5.

A self-contained, dependency-free analogue of the reference's offline
pipeline (generate_dataset/syn_gopro.py + esim_py +
tools/event_packagers.py:119-229): renders a moving scene, simulates
threshold-crossing events from log-intensity changes, and packages
everything in the H5 interchange schema the datasets consume.  Used for
test fixtures and benchmarking; the real GoPro pipeline lives in
``tools/``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import h5py
import numpy as np


def render_frames(
    num_frames: int, H: int, W: int, seed: int = 0, speed: float = 2.0
) -> np.ndarray:
    """(N, H, W, 3) uint8 moving smooth pattern (deterministic)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    phases = rng.uniform(0, 2 * np.pi, (3, 2))
    freqs = rng.uniform(0.05, 0.15, (3, 2))
    frames = np.empty((num_frames, H, W, 3), np.uint8)
    for n in range(num_frames):
        shift = n * speed
        for c in range(3):
            v = (
                np.sin(freqs[c, 0] * (xx + shift) + phases[c, 0])
                * np.cos(freqs[c, 1] * (yy + 0.5 * shift) + phases[c, 1])
            )
            frames[n, :, :, c] = np.clip((v * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    return frames


def simulate_events(
    frames: np.ndarray,
    timestamps: np.ndarray,
    contrast_threshold: float = 0.2,
    seed: int = 0,
):
    """ESIM-lite: per-pixel log-intensity threshold crossings between
    consecutive frames, linearly timestamped within the interval.

    Returns (xs, ys, ts, ps) sorted by t, ps in {-1, +1}, plus the event
    index of each frame (events with t < frame timestamp), matching
    `add_event_indices` (event_packagers.py:204-226).
    """
    rng = np.random.default_rng(seed)
    logI = np.log(frames.astype(np.float64).mean(-1) / 255.0 + 0.02)
    xs_l, ys_l, ts_l, ps_l = [], [], [], []
    N, H, W = logI.shape
    ref = logI[0].copy()
    for n in range(1, N):
        delta = logI[n] - ref
        n_cross = np.floor(np.abs(delta) / contrast_threshold).astype(np.int64)
        ys, xs = np.nonzero(n_cross)
        if len(ys) == 0:
            continue
        counts = n_cross[ys, xs]
        pol = np.sign(delta[ys, xs])
        t0, t1 = timestamps[n - 1], timestamps[n]
        for k in range(1, counts.max() + 1):
            sel = counts >= k
            m = int(sel.sum())
            frac = (k - 0.5) / (counts[sel] + 0.5) + rng.uniform(-0.01, 0.01, m)
            ts_l.append(t0 + np.clip(frac, 0, 1) * (t1 - t0))
            xs_l.append(xs[sel])
            ys_l.append(ys[sel])
            ps_l.append(pol[sel])
        ref = ref + n_cross * contrast_threshold * np.sign(delta)
    if not xs_l:
        return (np.zeros(0),) * 4, np.zeros(N, np.int64)
    xs = np.concatenate(xs_l)
    ys = np.concatenate(ys_l)
    ts = np.concatenate(ts_l)
    ps = np.concatenate(ps_l)
    order = np.argsort(ts, kind="stable")
    xs, ys, ts, ps = xs[order], ys[order], ts[order], ps[order]
    frame_idx = np.searchsorted(ts, timestamps, side="left")
    return (xs, ys, ts, ps), frame_idx


def write_clip_h5(
    path: str,
    num_frames: int = 64,
    H: int = 64,
    W: int = 80,
    fps: float = 240.0,
    seed: int = 0,
    real_exposure: Optional[Tuple[float, float]] = None,
) -> None:
    """Write a schema-compliant H5 clip.

    Images stored as BGR uint8 (the reference reader flips BGR->RGB,
    h5dataset.py:303).  `real_exposure=(duty, jitter)` additionally writes
    `exposure_begin_t`/`exposure_end_t` attrs for the real-data path.
    """
    frames = render_frames(num_frames, H, W, seed)
    timestamps = np.arange(num_frames, dtype=np.float64) / fps
    (xs, ys, ts, ps), frame_idx = simulate_events(frames, timestamps, seed=seed)

    with h5py.File(path, "w") as f:
        f.attrs["sensor_resolution"] = np.array([H, W], np.int64)
        f.attrs["num_events"] = len(xs)
        f.attrs["num_imgs"] = num_frames
        g = f.create_group("ori_events")
        g.create_dataset("xs", data=xs.astype(np.int16))
        g.create_dataset("ys", data=ys.astype(np.int16))
        g.create_dataset("ts", data=ts.astype(np.float64))
        g.create_dataset("ps", data=ps.astype(np.int8))
        imgs = f.create_group("ori_images")
        rng = np.random.default_rng(seed + 7)
        for n in range(num_frames):
            d = imgs.create_dataset(
                f"image{n:09d}", data=frames[n, :, :, ::-1]  # store BGR
            )
            d.attrs["timestamp"] = timestamps[n]
            d.attrs["ori_event_idx"] = int(frame_idx[n])
            if real_exposure is not None:
                duty, jitter = real_exposure
                period = 1.0 / fps
                eff = duty * (1 + rng.uniform(-jitter, jitter))
                d.attrs["exposure_begin_t"] = timestamps[n]
                d.attrs["exposure_end_t"] = timestamps[n] + eff * period
