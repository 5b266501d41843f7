"""Event/frame visualization (PNG writers).

Functional equivalent of `event_visualisation`
(myutils/vis_events/matplotlib_plot_events.py:59-313) without the
matplotlib figure machinery: frames and polarity-count renders are
rasterized directly and written with cv2 — same color conventions
(green/red, blue/red, gray; 1%/99% percentile normalization), pixel-exact
image sizes (the reference's DPI/bbox dance only approximated that).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def save_frame(frame: np.ndarray, path: str) -> None:
    """frame: HxWx3 uint8 RGB or HxW grayscale.

    PNG compression level 1: still lossless (identical decoded pixels,
    just larger files), ~2-3x faster to encode — PNG writes sit in the
    inference hot loop (infer_ours.py:132-142)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not _HAS_CV2:
        raise RuntimeError("cv2 required for PNG output")
    flags = [cv2.IMWRITE_PNG_COMPRESSION, 1]
    if frame.ndim == 3:
        cv2.imwrite(path, frame[:, :, ::-1], flags)  # RGB -> BGR
    else:
        cv2.imwrite(path, frame, flags)


def render_event_cnt(
    event_cnt: np.ndarray,
    color_scheme: str = "green_red",
    black_background: bool = True,
    normalize: bool = True,
) -> np.ndarray:
    """HxWx2 polarity counts (0: positive, 1: negative) -> HxWx3 float RGB
    in [0,1].  Percentile normalization and color conventions follow
    matplotlib_plot_events.py:127-240."""
    if color_scheme not in ("green_red", "gray", "blue_red"):
        raise ValueError(f"Not support {color_scheme}")
    pos = event_cnt[:, :, 0].astype(np.float64).copy()
    neg = event_cnt[:, :, 1].astype(np.float64).copy()

    if normalize:
        pos_min, pos_max = np.percentile(pos, 1), np.percentile(pos, 99)
        neg_min, neg_max = np.percentile(neg, 1), np.percentile(neg, 99)
        top = max(pos_max, neg_max)
        if pos_min != top:
            pos = (pos - pos_min) / (top - pos_min)
        if neg_min != top:
            neg = (neg - neg_min) / (top - neg_min)
    else:
        dominant_pos = (pos >= neg) & (pos != 0)
        dominant_neg = (pos < neg) & (neg != 0)
        pos = np.where(dominant_pos, 1.0, 0.0)
        neg = np.where(dominant_neg, 1.0, 0.0)
    pos = np.clip(pos, 0, 1)
    neg = np.clip(neg, 0, 1)

    H, W = pos.shape
    if color_scheme == "gray":
        return np.repeat((0.5 + 0.5 * pos - 0.5 * neg)[:, :, None], 3, axis=2)

    # channel roles: green_red -> positive=green, negative=red;
    # blue_red -> positive=blue(-ish, reference uses red positive/blue
    # negative in its blue_red branch; we follow dominant-polarity blending)
    pos_rgb = {"green_red": (0.0, 1.0, 0.0), "blue_red": (1.0, 0.0, 0.0)}[color_scheme]
    neg_rgb = {"green_red": (1.0, 0.0, 0.0), "blue_red": (0.0, 0.0, 1.0)}[color_scheme]

    img = np.zeros((H, W, 3)) if black_background else np.ones((H, W, 3))
    dominant = np.where(pos >= neg, pos, neg)
    color = np.where(
        (pos >= neg)[:, :, None],
        np.asarray(pos_rgb)[None, None],
        np.asarray(neg_rgb)[None, None],
    )
    active = ((pos > 0) | (neg > 0))[:, :, None]
    strength = dominant[:, :, None]
    if black_background:
        img = np.where(active, color * strength, img)
    else:
        img = np.where(active, 1.0 - strength * (1.0 - color), img)
    return img


def save_event_cnt(
    event_cnt: np.ndarray,
    path: str,
    color_scheme: str = "green_red",
    black_background: bool = True,
    normalize: bool = True,
) -> None:
    img = render_event_cnt(event_cnt, color_scheme, black_background, normalize)
    save_frame((img * 255).astype(np.uint8), path)


def save_event_stack_grid(stack: np.ndarray, path: str, vmax: float = 10.0) -> None:
    """Grid visualization of per-bin signed event images
    (`plot_event_stack`, matplotlib_plot_events.py:81-124): blue/red
    diverging per bin, bins tiled into a near-square grid."""
    H, W, C = stack.shape
    tb = C // 2
    signed = stack.reshape(H, W, tb, 2)
    signed = signed[..., 0] - signed[..., 1]  # pos - neg per bin
    rows = int(np.sqrt(tb))
    while tb % rows:
        rows -= 1
    cols = tb // rows
    canvas = np.ones(((H + 2) * rows, (W + 2) * cols, 3))
    for i in range(tb):
        r, c = divmod(i, cols)
        v = np.clip(signed[:, :, i] / vmax, -1, 1)
        img = np.ones((H, W, 3))
        img[..., 0] -= np.clip(v, 0, 1)          # positive -> blue (cut R,G)
        img[..., 1] -= np.abs(v)
        img[..., 2] -= np.clip(-v, 0, 1)         # negative -> red
        canvas[r * (H + 2) : r * (H + 2) + H, c * (W + 2) : c * (W + 2) + W] = img
    save_frame((np.clip(canvas, 0, 1) * 255).astype(np.uint8), path)


def plot_event_cloud_3d(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    path: str,
    max_points: int = 50_000,
    elev: float = 20.0,
    azim: float = -60.0,
) -> None:
    """3D event-cloud scatter (x, t, y) with polarity colors
    (`plot_event_cloud`, matplotlib_plot_events.py:433+).  Subsamples to
    `max_points`.  Requires matplotlib (gated)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(ts)
    if n > max_points:
        sel = np.linspace(0, n - 1, max_points).astype(int)
        xs, ys, ts, ps = xs[sel], ys[sel], ts[sel], ps[sel]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    colors = np.where(ps.reshape(-1, 1) > 0, [[1.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    ax.scatter(xs, ts, ys, c=colors, s=0.5, alpha=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("t")
    ax.set_zlabel("y")
    ax.view_init(elev=elev, azim=azim)
    ax.invert_zaxis()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def stack_to_cnt(stack: np.ndarray) -> np.ndarray:
    """(H, W, 2*TB) bin-major flattened stack -> HxWx2 polarity counts
    (`stack2cnt` analogue, encodings.py:412-430)."""
    H, W, C = stack.shape
    s = stack.reshape(H, W, C // 2, 2)
    return s.sum(axis=2)


def save_event_stack_movie(
    stacks, path: str, fps: int = 10, color_scheme: str = "blue_red"
) -> None:
    """Animated GIF sweeping the temporal bins of one or more event stacks
    (the movie mode of `PlotEventStack`, matplotlib_plot_events.py:614-699).

    stacks: (N, H, W, 2*TB) sequence (or a single (H, W, 2*TB) stack); each
    movie frame is one temporal bin's polarity render.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    stacks = np.asarray(stacks)
    if stacks.ndim == 3:
        stacks = stacks[None]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.axis("off")
    frames = []
    for stack in stacks:
        tb = stack.shape[-1] // 2
        for b in range(tb):
            img = render_event_cnt(
                stack[..., 2 * b : 2 * b + 2], color_scheme=color_scheme,
                black_background=False,
            )
            frames.append([ax.imshow(img, animated=True)])
    ani = animation.ArtistAnimation(fig, frames, interval=1000 // fps, blit=True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)


def save_event_cloud_movie(
    windows, path: str, fps: int = 5, max_points: int = 20_000,
    frames_panel=None,
) -> None:
    """Animated GIF of 3D event-cloud windows (x, t, y scatter, polarity
    colors), optionally with a frame panel below — the headless equivalent
    of `PlotEvent3D.CreateMovie` (matplotlib_plot_events.py:700-812).

    windows: iterable of (xs, ys, ts, ps) tuples, one movie frame each.
    frames_panel: optional iterable of (H, W[, 3]) images shown beneath.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_axes([0.0, 0.3, 1.0, 0.7], projection="3d")
    ax.set_xlabel("x"); ax.set_ylabel("t"); ax.set_zlabel("y")
    fax = None
    if frames_panel is not None:
        fax = fig.add_axes([0.35, 0.0, 0.3, 0.3])
        fax.axis("off")
        frames_panel = list(frames_panel)

    windows = list(windows)
    if not windows:
        raise ValueError("save_event_cloud_movie needs at least one event window")
    movie = []
    for i, (xs, ys, ts, ps) in enumerate(windows):
        xs, ys, ts, ps = (np.asarray(a) for a in (xs, ys, ts, ps))
        n = len(ts)
        if n > max_points:
            sel = np.linspace(0, n - 1, max_points).astype(int)
            xs, ys, ts, ps = xs[sel], ys[sel], ts[sel], ps[sel]
        split = [
            ax.scatter(xs[ps > 0], ts[ps > 0], ys[ps > 0], c="b", marker=".", s=1),
            ax.scatter(xs[ps <= 0], ts[ps <= 0], ys[ps <= 0], c="r", marker=".", s=1),
        ]
        if fax is not None and i < len(frames_panel):
            split.append(fax.imshow(frames_panel[i], cmap="gray", animated=True))
        movie.append(split)
    ani = animation.ArtistAnimation(fig, movie, interval=1000 // fps, blit=False)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)
