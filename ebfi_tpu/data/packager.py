"""Multiscale H5 packaging — the offline dataset-generation writer.

Equivalent of `hdf5_packager_multiscale`
(generate_dataset/tools/event_packagers.py:119-229): writes image datasets
(uint8 HWC BGR) with `timestamp` attrs, per-scale event groups
(ori/down2/down4/down8), and post-hoc per-image `{prex}_event_idx` attrs by
searchsorted alignment of image timestamps into each scale's event stream.

Downscaled event streams follow the reference pipeline's convention:
coordinates integer-divided by the scale factor (events collapse onto the
coarser grid), timestamps/polarities unchanged.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Tuple

import h5py
import numpy as np

SCALES = {"ori": 1, "down2": 2, "down4": 4, "down8": 8}


class H5Packager:
    def __init__(self, path: str, compression: str = "gzip"):
        self.h5 = h5py.File(path, "w")
        self.compression = compression
        self._img_count = 0
        self._img_ts = []

    def set_metadata(self, sensor_resolution: Tuple[int, int], **attrs) -> None:
        self.h5.attrs["sensor_resolution"] = np.asarray(sensor_resolution, np.int64)
        for k, v in attrs.items():
            self.h5.attrs[k] = v

    def package_image(
        self,
        image_bgr: np.ndarray,
        timestamp: float,
        exposure: Optional[Tuple[float, float]] = None,
    ) -> None:
        d = self.h5.require_group("ori_images").create_dataset(
            f"image{self._img_count:09d}", data=image_bgr, compression=self.compression
        )
        d.attrs["timestamp"] = timestamp
        d.attrs["size"] = image_bgr.shape
        if exposure is not None:
            d.attrs["exposure_begin_t"] = exposure[0]
            d.attrs["exposure_end_t"] = exposure[1]
        self._img_count += 1
        self._img_ts.append(timestamp)

    def package_events(
        self,
        xs: np.ndarray,
        ys: np.ndarray,
        ts: np.ndarray,
        ps: np.ndarray,
        scales: Sequence[str] = ("ori", "down2", "down4", "down8"),
    ) -> None:
        for prex in scales:
            f = SCALES[prex]
            g = self.h5.require_group(f"{prex}_events")
            g.create_dataset("xs", data=(xs // f).astype(np.int16),
                             compression=self.compression)
            g.create_dataset("ys", data=(ys // f).astype(np.int16),
                             compression=self.compression)
            g.create_dataset("ts", data=ts.astype(np.float64),
                             compression=self.compression)
            g.create_dataset("ps", data=ps.astype(np.int8),
                             compression=self.compression)

    def add_event_indices(self, scales: Sequence[str] = ("ori", "down2", "down4", "down8")) -> None:
        """Per-image event index attrs: first event with t >= image timestamp
        (event_packagers.py:204-226)."""
        img_ts = np.asarray(self._img_ts)
        for prex in scales:
            if f"{prex}_events" not in self.h5:
                continue
            ts = self.h5[f"{prex}_events/ts"][:]
            idx = np.searchsorted(ts, img_ts, side="left")
            for i in range(self._img_count):
                self.h5["ori_images"][f"image{i:09d}"].attrs[f"{prex}_event_idx"] = int(idx[i])

    def close(self) -> None:
        self.h5.attrs["num_imgs"] = self._img_count
        self.h5.close()


def package_sequence(
    path: str,
    frames_bgr: Iterable[np.ndarray],
    timestamps: Sequence[float],
    events: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    sensor_resolution: Tuple[int, int],
    scales: Sequence[str] = ("ori", "down2", "down4", "down8"),
    exposures: Optional[Sequence[Tuple[float, float]]] = None,
) -> None:
    """One-shot: frames + events -> schema-complete multiscale H5."""
    pk = H5Packager(path)
    pk.set_metadata(sensor_resolution)
    for i, (frame, t) in enumerate(zip(frames_bgr, timestamps)):
        pk.package_image(frame, t, None if exposures is None else exposures[i])
    xs, ys, ts, ps = events
    pk.package_events(xs, ys, ts, ps, scales)
    pk.h5.attrs["num_events"] = len(xs)
    pk.add_event_indices(scales)
    pk.close()
