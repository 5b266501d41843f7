"""Flow-pipeline visualization (the legacy `Visualization` class).

Reference: myutils/vis_events/visualization.py:11-329 — rendering/storage
of the optical-flow estimation and image-reconstruction pipeline
(events / frames / flow color wheel / image-of-warped-events /
reconstructed brightness).  Headless-first: `store()` writes the PNG tree
+ timestamps; there is no cv2.imshow live path (use the returned images).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .vis import render_event_cnt, save_frame


def flow_to_image(flow_x: np.ndarray, flow_y: np.ndarray) -> np.ndarray:
    """Color-encode flow with the CVPR'21 'Back to Event Basics' scheme
    (visualization.py:289-315): hue = angle, value = min-max magnitude.
    flow_x/flow_y: (H, W) -> (H, W, 3) uint8 RGB."""
    import matplotlib.colors

    flows = np.stack((flow_x, flow_y), axis=2)
    mag = np.linalg.norm(flows, axis=2)
    min_mag = mag.min()
    mag_range = mag.max() - min_mag

    ang = np.arctan2(flow_y, flow_x) + np.pi
    ang = ang / np.pi / 2.0

    hsv = np.zeros([flow_x.shape[0], flow_x.shape[1], 3])
    hsv[:, :, 0] = ang
    hsv[:, :, 1] = 1.0
    hsv[:, :, 2] = mag - min_mag
    if mag_range != 0.0:
        hsv[:, :, 2] /= mag_range
    return (255 * matplotlib.colors.hsv_to_rgb(hsv)).astype(np.uint8)


def minmax_norm(x: np.ndarray) -> np.ndarray:
    """Robust 1-99 percentile min-max normalization
    (visualization.py:317-326)."""
    den = np.percentile(x, 99) - np.percentile(x, 1)
    if den != 0:
        x = (x - np.percentile(x, 1)) / den
    return np.clip(x, 0, 1)


class FlowVisualization:
    """Store rendered flow-pipeline images (visualization.py:209-287).

    Directory layout per sequence: events/ flow/ frames/ iwe/ brightness/
    + timestamps.txt, files %09d.png.
    """

    def __init__(self, store_dir: str, color_scheme: str = "green_red"):
        self.store_dir = store_dir
        self.color_scheme = color_scheme
        self.img_idx = 0
        self._sequence = None
        self._ts_file = None

    def _sequence_dir(self, sequence: str) -> str:
        path_to = os.path.join(self.store_dir, sequence)
        if sequence != self._sequence:
            for sub in ("events", "flow", "frames", "iwe", "brightness"):
                os.makedirs(os.path.join(path_to, sub), exist_ok=True)
            if self._ts_file is not None:
                self._ts_file.close()
            self._ts_file = open(os.path.join(path_to, "timestamps.txt"), "w")
            self._sequence = sequence
            self.img_idx = 0
        return path_to

    def event_image(self, event_cnt: np.ndarray) -> np.ndarray:
        """(H, W, 2) polarity counts -> uint8 render
        (visualization.py:29-38)."""
        img = render_event_cnt(
            np.asarray(event_cnt), color_scheme=self.color_scheme,
            black_background=True,
        )
        return (img * 255).astype(np.uint8)

    def store(
        self,
        event_cnt: Optional[np.ndarray],
        flow: Optional[np.ndarray],
        iwe: Optional[np.ndarray],
        brightness: Optional[np.ndarray],
        sequence: str,
        frames: Optional[np.ndarray] = None,
        ts: Optional[float] = None,
    ) -> None:
        """All image-like args are HWC numpy (events/iwe: (H, W, 2) counts;
        flow: (H, W, 2); brightness: (H, W) or (H, W, 1))."""
        path_to = self._sequence_dir(sequence)
        name = f"{self.img_idx:09d}.png"

        if event_cnt is not None:
            save_frame(self.event_image(event_cnt), os.path.join(path_to, "events", name))
        if frames is not None:
            f = np.asarray(frames)
            save_frame(f.astype(np.uint8), os.path.join(path_to, "frames", name))
        if flow is not None:
            fl = np.asarray(flow)
            save_frame(
                flow_to_image(fl[..., 0], fl[..., 1]), os.path.join(path_to, "flow", name)
            )
        if iwe is not None:
            save_frame(self.event_image(iwe), os.path.join(path_to, "iwe", name))
        if brightness is not None:
            b = np.asarray(brightness).reshape(brightness.shape[0], -1)
            img = (minmax_norm(b) * 255).astype(np.uint8)
            save_frame(img, os.path.join(path_to, "brightness", name))
        if ts is not None and self._ts_file is not None:
            self._ts_file.write(f"{ts}\n")
            self._ts_file.flush()
        self.img_idx += 1

    def close(self):
        if self._ts_file is not None:
            self._ts_file.close()
            self._ts_file = None
