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


def sample_thresholds(
    rng: np.random.Generator,
    ct_range: Tuple[float, float] = (0.2, 0.5),
    mu: float = 1.0,
    sigma: float = 0.1,
) -> Tuple[float, float]:
    """Per-sequence contrast-threshold sampling, the reference's scheme
    (generate_dataset/syn_gopro.py:104-118 with config :14-27):
    ``Cp ~ U[ct_range]``, ``Cn = gauss(mu, sigma) * Cp``, both clamped to
    ``ct_range``.  Returns (cp, cn)."""
    cp = float(rng.uniform(ct_range[0], ct_range[1]))
    cn = float(rng.normal(mu, sigma)) * cp
    cp = min(max(cp, ct_range[0]), ct_range[1])
    cn = min(max(cn, ct_range[0]), ct_range[1])
    return cp, cn


def simulate_events(
    frames: np.ndarray,
    timestamps: np.ndarray,
    contrast_threshold: float = 0.2,
    seed: int = 0,
    *,
    cp: Optional[float] = None,
    cn: Optional[float] = None,
    refractory_period: float = 0.0,
):
    """ESIM-lite: per-pixel log-intensity threshold crossings between
    consecutive frames, timestamped by linear interpolation of the
    log-intensity within the interval.

    Mirrors esim_py's model as configured by the reference
    (generate_dataset/syn_gopro.py:14-27,104-118):

    - independent positive / negative thresholds ``cp`` / ``cn`` (both
      default to ``contrast_threshold``); use :func:`sample_thresholds`
      for the reference's per-sequence randomization;
    - a per-pixel ``refractory_period``: a crossing fires only if it is
      more than the refractory period after the pixel's last *emitted*
      event; the reference level still updates for suppressed crossings
      (esim_py semantics; reference config uses 1e-4 s);
    - crossing times are the linear-interpolation solutions
      ``t = t0 + (level - L0)/(L1 - L0) * (t1 - t0)`` plus a small jitter.

    Returns (xs, ys, ts, ps) sorted by t, ps in {-1, +1}, plus the event
    index of each frame (events with t < frame timestamp), matching
    `add_event_indices` (event_packagers.py:204-226).
    """
    cp = contrast_threshold if cp is None else cp
    cn = contrast_threshold if cn is None else cn
    rng = np.random.default_rng(seed)
    logI = np.log(frames.astype(np.float64).mean(-1) / 255.0 + 0.02)
    xs_l, ys_l, ts_l, ps_l = [], [], [], []
    N, H, W = logI.shape
    ref = logI[0].copy()
    last_t = np.full((H, W), -np.inf)
    for n in range(1, N):
        delta = logI[n] - ref
        thr = np.where(delta > 0, cp, cn)
        n_cross = np.floor(np.abs(delta) / thr).astype(np.int64)
        ys, xs = np.nonzero(n_cross)
        if len(ys) == 0:
            continue
        counts = n_cross[ys, xs]
        pol = np.sign(delta[ys, xs])
        step = thr[ys, xs] * pol  # signed level increment per crossing
        t0, t1 = timestamps[n - 1], timestamps[n]
        L0, L1 = logI[n - 1][ys, xs], logI[n][ys, xs]
        denom = np.where(L1 == L0, 1.0, L1 - L0)
        for k in range(1, counts.max() + 1):
            sel = counts >= k
            m = int(sel.sum())
            level = ref[ys[sel], xs[sel]] + k * step[sel]
            frac = np.where(
                (L1 == L0)[sel], 1.0, (level - L0[sel]) / denom[sel]
            )
            frac = np.clip(frac + rng.uniform(-0.01, 0.01, m), 0, 1)
            tk = t0 + frac * (t1 - t0)
            prev = last_t[ys[sel], xs[sel]]
            fire = np.isinf(prev) | (tk - prev > refractory_period)
            last_t[ys[sel][fire], xs[sel][fire]] = tk[fire]
            ts_l.append(tk[fire])
            xs_l.append(xs[sel][fire])
            ys_l.append(ys[sel][fire])
            ps_l.append(pol[sel][fire])
        ref = ref + n_cross * thr * np.sign(delta)
    if not xs_l or not len(np.concatenate(xs_l)):
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
    down_scales: Tuple[int, ...] = (),
) -> None:
    """Write a schema-compliant H5 clip.

    Images stored as BGR uint8 (the reference reader flips BGR->RGB,
    h5dataset.py:303).  `real_exposure=(duty, jitter)` additionally writes
    `exposure_begin_t`/`exposure_end_t` attrs for the real-data path.
    `down_scales` (e.g. (2, 4)) adds the multiscale event groups the
    reference packager produces (`down{s}_events` + per-image
    `down{s}_event_idx` attrs, event_packagers.py:128-146,204-226) with
    events simulated on block-mean-downsampled frames — H and W must be
    divisible by each scale.
    """
    frames = render_frames(num_frames, H, W, seed)
    timestamps = np.arange(num_frames, dtype=np.float64) / fps
    (xs, ys, ts, ps), frame_idx = simulate_events(frames, timestamps, seed=seed)
    down = {}
    for s in down_scales:
        if H % s or W % s:
            raise ValueError(f"H={H}, W={W} not divisible by down scale {s}")
        small = (
            frames.reshape(num_frames, H // s, s, W // s, s, 3)
            .mean((2, 4))
            .round()
            .astype(np.uint8)
        )
        down[s] = simulate_events(small, timestamps, seed=seed + s)

    with h5py.File(path, "w") as f:
        f.attrs["sensor_resolution"] = np.array([H, W], np.int64)
        f.attrs["num_events"] = len(xs)
        f.attrs["num_imgs"] = num_frames
        g = f.create_group("ori_events")
        g.create_dataset("xs", data=xs.astype(np.int16))
        g.create_dataset("ys", data=ys.astype(np.int16))
        g.create_dataset("ts", data=ts.astype(np.float64))
        g.create_dataset("ps", data=ps.astype(np.int8))
        for s, ((dxs, dys, dts, dps), _) in down.items():
            gd = f.create_group(f"down{s}_events")
            gd.create_dataset("xs", data=dxs.astype(np.int16))
            gd.create_dataset("ys", data=dys.astype(np.int16))
            gd.create_dataset("ts", data=dts.astype(np.float64))
            gd.create_dataset("ps", data=dps.astype(np.int8))
        imgs = f.create_group("ori_images")
        rng = np.random.default_rng(seed + 7)
        for n in range(num_frames):
            d = imgs.create_dataset(
                f"image{n:09d}", data=frames[n, :, :, ::-1]  # store BGR
            )
            d.attrs["timestamp"] = timestamps[n]
            d.attrs["ori_event_idx"] = int(frame_idx[n])
            for s, (_, dfi) in down.items():
                d.attrs[f"down{s}_event_idx"] = int(dfi[n])
            if real_exposure is not None:
                duty, jitter = real_exposure
                period = 1.0 / fps
                eff = duty * (1 + rng.uniform(-jitter, jitter))
                d.attrs["exposure_begin_t"] = timestamps[n]
                d.attrs["exposure_end_t"] = timestamps[n] + eff * period
