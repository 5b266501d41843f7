"""H5 clip datasets: windowing, on-the-fly blur synthesis, event encoding.

Consumes the reference's H5 interchange schema (SURVEY.md §2.3; produced by
generate_dataset/tools/event_packagers.py:119-229):

- file attr ``sensor_resolution`` = [H, W]
- groups ``ori_images/image{idx:09d}`` (uint8 HWC BGR) with attrs
  ``timestamp`` and ``{prex}_event_idx``
- event groups ``{prex}_events/{xs,ys,ts,ps}`` for prex in
  {ori, down2, down4, down8}

Semantics mirror dataloader/h5dataset.py: periods of `NumFramePerPeriod`
latent frames; the blurry frame is synthesized as the mean of the first
`ExposureTime` latent frames (h5dataset.py:311); exposure regimes
Fixed/Auto/Custom (h5dataset.py:121-164); events sliced by per-image
``{prex}_event_idx`` attrs, time-normalized, and rasterized to a
per-polarity TB-bin stack (h5dataset.py:327-352).

Output layout is TPU-native NHWC; the event stack is channel-flattened
(H, W, 2*TB) with bin-major/polarity-minor channels, exactly the order the
model consumes after the reference's ``Event.view(B,-1,H,W)``
(model_singleframe.py:297).
"""
from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from .encodings import events_to_stack_np, normalize_event_ts
from ..native import available as _native_available

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def _encode_stack(xs, ys, ts, ps, num_bins, sensor_size):
    """Host event rasterizer: C++ data plane when built, numpy fallback."""
    if _native_available():
        from ..native import events_to_stack_native

        return events_to_stack_native(xs, ys, ts, ps, num_bins, sensor_size)
    return events_to_stack_np(xs, ys, ts, ps, num_bins, sensor_size)


# ----------------------------------------------------------------------- #
# scale resolution

_DOWN = {"ori": 1, "down2": 2, "down4": 4, "down8": 8, "down16": 16}


@dataclass
class ScaleSpec:
    """Input/GT prefix + resolution resolution (h5dataset.py:30-102)."""

    inp_prefix: str
    gt_prefix: str
    inp_resolution: Tuple[int, int]
    gt_resolution: Tuple[int, int]

    @staticmethod
    def resolve(sensor_resolution: Sequence[int], scale: int, ori_scale: str) -> "ScaleSpec":
        if ori_scale not in _DOWN:
            raise ValueError(f"Error scale setting: scale {scale}, ori_scale {ori_scale}")
        inp_factor = _DOWN[ori_scale]
        gt_factor = inp_factor // scale if ori_scale != "ori" else 1
        if ori_scale == "ori" and scale != 1:
            raise ValueError(f"Error scale setting: scale {scale}, ori_scale {ori_scale}")
        if gt_factor < 1 or (ori_scale != "ori" and inp_factor % scale != 0):
            raise ValueError(f"Error scale setting: scale {scale}, ori_scale {ori_scale}")
        gt_prefix = next(k for k, v in _DOWN.items() if v == gt_factor)
        H, W = sensor_resolution
        return ScaleSpec(
            inp_prefix=ori_scale,
            gt_prefix=gt_prefix,
            inp_resolution=(round(H / inp_factor), round(W / inp_factor)),
            gt_resolution=(round(H / gt_factor), round(W / gt_factor)),
        )


# ----------------------------------------------------------------------- #
# window computation

def compute_period_windows(
    num_imgs: int,
    num_frame_per_period: int,
    num_frame_per_blurry: int,
    exposure_method: str,
    exposure_time: Optional[Sequence[int]],
    rng: Optional[np.random.Generator] = None,
):
    """Per-period latent/blurry indices + exposure duty
    (h5dataset.py:121-164).

    `Auto` randomizes once at construction (reference quirk, h5dataset.py:153).
    Returns (period_bounds, latent_indices, blurry_indices, duty).
    """
    if exposure_method not in ("Fixed", "Auto", "Custom"):
        raise ValueError("Error exposure setting!")
    if not (1 <= num_frame_per_blurry <= num_frame_per_period):
        raise ValueError("Number of frames per blurry must be in [1, NumFramePerPeriod]")
    rng = rng or np.random.default_rng()

    starts = np.arange(0, num_imgs, num_frame_per_period)[:-1]
    periods, latents, blurries, duty = [], [], [], []
    for j, idx in enumerate(starts):
        periods.append((int(idx), int(idx + num_frame_per_period - 1)))
        latents.append(list(range(idx, idx + num_frame_per_period)))
        if exposure_method == "Fixed":
            n = num_frame_per_blurry
        elif exposure_method == "Auto":
            n = int(rng.integers(1, num_frame_per_period))
        else:  # Custom
            n = int(exposure_time[j % len(exposure_time)])
            if n > num_frame_per_period:
                raise ValueError("Number of frames per blurry must <= frames per period")
        blurries.append(list(range(idx, idx + n)))
        duty.append(n / num_frame_per_period)
    return periods, latents, blurries, duty


def compute_seq_windows(
    num_period: int,
    num_period_per_seq: int,
    sliding_window_seq: int,
    num_period_per_load: int,
    sliding_window_load: int,
) -> List[List[Tuple[int, int]]]:
    """Sequence -> load-window nesting (h5dataset.py:166-186)."""
    seqs = []
    for idx in range(0, num_period, sliding_window_seq):
        start, end = idx, idx + num_period_per_seq - 1
        if end <= num_period - 1:
            loads = [
                (i, i + num_period_per_load - 1)
                for i in range(start, end + 1, sliding_window_load)
                if i + num_period_per_load - 1 <= end
            ]
            seqs.append(loads)
    return seqs


# ----------------------------------------------------------------------- #
# augmentation

def _torch_parity_noise(out, kinds, cfg, seed_noise):
    """Event-noise augmentation in torch-RNG bit-parity mode
    (`data_augment.noise.rng: torch`): reproduces the reference's
    `add_noise` (h5dataset.py:455-462 — `torch.manual_seed(seed+3)` then
    `randn_like`/`rand_like` on the (L, TB, 2, H, W) event stack) so a run
    seeded like `infer_ours.py:419` produces bit-identical noisy inputs.
    Our stacks are channel-flattened NHWC, so the noise is drawn in the
    reference layout and transposed.  Requires torch (cpu); the default
    numpy path is statistically identical and torch-free."""
    import torch

    std = cfg["noise"]["noise_std"]
    frac = cfg["noise"]["noise_fraction"]
    out = dict(out)
    for k, v in out.items():
        if kinds.get(k) != "event":
            continue
        lead, (H, W, C) = v.shape[:-3], v.shape[-3:]
        ref_shape = (*lead, C // 2, 2, H, W)
        torch.manual_seed(seed_noise)
        noise = (std * torch.randn(ref_shape, dtype=torch.float32)).abs().int()
        if frac < 1.0:
            mask = torch.rand(ref_shape, dtype=torch.float32) >= frac
            noise = noise.masked_fill(mask, 0)
        n = noise.numpy()  # (*lead, TB, 2, H, W)
        n = np.moveaxis(n, (-4, -3), (-2, -1))  # (*lead, H, W, TB, 2)
        out[k] = v + n.reshape(v.shape).astype(v.dtype)
    return out


def augment(
    arrays: Dict[str, np.ndarray],
    kinds: Dict[str, str],
    cfg: dict,
    seed: int,
    gt_resolution: Tuple[int, int],
) -> Dict[str, np.ndarray]:
    """Joint seeded augmentation of NHWC arrays (h5dataset.py:368-443).

    kinds: per-key 'frame' or 'event'.  Crops/flips are identical across all
    arrays (same seed); noise/hot-pixel only touch events.  The reference's
    seeding scheme (python `random` with seed, seed+1, ...) is preserved so
    the same seed reproduces the same crops.
    """
    out = dict(arrays)
    seed_h, seed_v, seed_crop, seed_noise, seed_hot = seed, seed + 1, seed + 2, seed + 3, seed + 4
    order = cfg.get("augment", [])
    for mechanism in order:
        if mechanism == "HorizontalFlip" and cfg["flip"]["enabled"]:
            random.seed(seed_h)
            if random.random() < cfg["flip"]["horizontal_prob"]:
                out = {k: np.flip(v, axis=-2) for k, v in out.items()}  # W axis (NHWC)
        elif mechanism == "VertivcalFlip" and cfg["flip"]["enabled"]:
            random.seed(seed_v)
            if random.random() < cfg["flip"]["vertical_prob"]:
                out = {k: np.flip(v, axis=-3) for k, v in out.items()}  # H axis
        elif mechanism == "RandomCrop" and cfg["random_crop"]["enabled"]:
            th, tw = cfg["random_crop"]["size"]
            h, w = gt_resolution
            if th < h and tw < w:
                random.seed(seed_crop)
                i = random.randint(0, h - th)
                j = random.randint(0, w - tw)
                out = {k: v[..., i : i + th, j : j + tw, :] for k, v in out.items()}
        elif mechanism == "CenterCrop" and cfg["center_crop"]["enabled"]:
            th, tw = cfg["center_crop"]["size"]
            h, w = gt_resolution
            if th < h and tw < w:
                i, j = (h - th) // 2, (w - tw) // 2
                out = {k: v[..., i : i + th, j : j + tw, :] for k, v in out.items()}
        elif mechanism == "Noise" and cfg["noise"]["enabled"]:
            if cfg["noise"].get("rng") == "torch":
                out = _torch_parity_noise(out, kinds, cfg, seed_noise)
                continue
            rng = np.random.default_rng(seed_noise)
            for k, v in out.items():
                if kinds.get(k) == "event":
                    noise = np.abs(rng.normal(0, cfg["noise"]["noise_std"], v.shape)).astype(np.int32)
                    if cfg["noise"]["noise_fraction"] < 1.0:
                        keep = rng.random(v.shape) < cfg["noise"]["noise_fraction"]
                        noise = np.where(keep, noise, 0)
                    out[k] = v + noise.astype(v.dtype)
        elif mechanism == "HotPixel" and cfg["hot_pixel"]["enabled"]:
            if cfg["noise"].get("rng") == "torch":
                # torch-parity mode reproduces the reference's OBSERVED
                # behavior, where HotPixel never fires (the `type == [...]`
                # list-comparison typo, h5dataset.py:438)
                continue
            # NOTE: unreachable in the reference due to the `type == [...]`
            # list-comparison typo (h5dataset.py:438); implemented correctly
            # here and off by default.
            rng = np.random.default_rng(seed_hot)
            for k, v in out.items():
                if kinds.get(k) == "event":
                    h, w = v.shape[-3], v.shape[-2]
                    n = int(cfg["hot_pixel"]["hot_pixel_fraction"] * h * w)
                    ys = rng.integers(0, h, n)
                    xs = rng.integers(0, w, n)
                    add = np.abs(rng.normal(0, cfg["hot_pixel"]["hot_pixel_std"], n)).astype(v.dtype)
                    v = v.copy()
                    v[..., ys, xs, :] += add[:, None]
                    out[k] = v
    return out


# ----------------------------------------------------------------------- #
# datasets

class H5ClipDataset:
    """Synthetic-blur dataset over one H5 clip (dataloader/h5dataset.py)."""

    def __init__(self, h5_path: str, config: dict):
        self.config = config
        self.h5_path = h5_path
        self.h5 = h5py.File(h5_path, "r")
        self.sensor_resolution = tuple(self.h5.attrs["sensor_resolution"][:2])
        self.spec = ScaleSpec.resolve(
            self.sensor_resolution, config["scale"], config["ori_scale"]
        )
        self.time_bins = config["time_bins"]
        self.num_frame_per_period = config["NumFramePerPeriod"]
        self.num_period_per_load = config["NumPeriodPerLoad"]
        self.deblur_pretrain = config.get("DeblurPretrain", False)
        self.need_neighbor_gt = config.get("NeedNeighborGT", False)
        self.interval = self.num_frame_per_period * self.num_period_per_load

        num_imgs = len(self.h5["ori_images"].keys())
        (self.periods, self.latent_idx, self.blurry_idx, self.duty) = compute_period_windows(
            num_imgs,
            self.num_frame_per_period,
            config["NumFramePerBlurry"],
            config["ExposureMethod"],
            config.get("ExposureTime"),
        )
        self.seq_indices = compute_seq_windows(
            len(self.periods),
            config["NumPeriodPerSeq"],
            config["SlidingWindowSeq"],
            self.num_period_per_load,
            config["SlidingWindowLoad"],
        )

    def __len__(self) -> int:
        return len(self.seq_indices)

    # -- raw readers -------------------------------------------------- #

    def _read_frame(self, i: int) -> np.ndarray:
        """uint8 HWC, BGR->RGB, resized to the GT resolution
        (h5dataset.py:303-305)."""
        frame = self.h5["ori_images"][f"image{i:09d}"][:][:, :, ::-1]
        if frame.shape[:-1] != tuple(self.spec.gt_resolution):
            if not _HAS_CV2:
                raise RuntimeError("cv2 required for resolution rescaling")
            frame = cv2.resize(
                frame, self.spec.gt_resolution[::-1], interpolation=cv2.INTER_CUBIC
            )
        return frame

    def _frames(self, indices: Sequence[int]) -> np.ndarray:
        return np.stack([self._read_frame(i) for i in indices])

    def _blurry(self, indices: Sequence[int]) -> np.ndarray:
        """On-the-fly blur synthesis = mean of the exposure-window frames
        (h5dataset.py:311); C++ data plane when no rescale is needed."""
        native_ok = _native_available() and self.spec.gt_prefix == "ori"
        if native_ok:
            raw = np.stack(
                [self.h5["ori_images"][f"image{i:09d}"][:] for i in indices]
            )
            if raw.shape[1:3] == tuple(self.spec.gt_resolution):
                from ..native import blurry_mean_native

                return blurry_mean_native(raw)
        # exact reference op order (h5dataset.py:311): uint8 mean in f64
        # (numpy promotion), cast f32, THEN divide by 255 in f32 — bit-
        # identical to `torch.from_numpy(FNumpy.mean(0)).float() / 255`
        return self._frames(indices).mean(0).astype(np.float32) / np.float32(255.0)

    def _event_stack(self, start: int, end: int) -> np.ndarray:
        """(H, W, 2*TB) bin-major count stack for frames [start, end]."""
        prex = self.spec.gt_prefix
        i0 = self.h5["ori_images"][f"image{start:09d}"].attrs[f"{prex}_event_idx"]
        i1 = self.h5["ori_images"][f"image{end:09d}"].attrs[f"{prex}_event_idx"]
        xs = self.h5[f"{prex}_events/xs"][i0:i1]
        ys = self.h5[f"{prex}_events/ys"][i0:i1]
        ts = self.h5[f"{prex}_events/ts"][i0:i1]
        ps = self.h5[f"{prex}_events/ps"][i0:i1]
        if len(xs) == 0:
            xs = ys = ts = ps = np.array([0.0])
        ts = normalize_event_ts(ts)
        stack = _encode_stack(
            xs, ys, ts, ps.astype(np.float64), self.time_bins, self.spec.gt_resolution
        )  # (2, TB, H, W)
        # -> (H, W, TB, 2) -> (H, W, 2*TB) bin-major, polarity-minor
        return stack.transpose(2, 3, 1, 0).reshape(
            *self.spec.gt_resolution, 2 * self.time_bins
        )

    # -- item assembly ------------------------------------------------ #

    def get(self, index: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        if seed is None:
            seed = random.randint(0, 2**32)
        sequence = self.seq_indices[index]

        latents, blurries, events, neighbors = [], [], [], []
        latent_ts, rel_ts, blurry_ts, duties = [], [], [], []
        for (left, right) in sequence:
            all_latent: List[int] = []
            all_blurry: List[List[int]] = []
            lat_frames, blur_frames, nei_frames, duty_list = [], [], [], []
            for p in range(left, right + 1):
                li = self.latent_idx[p]
                bi = self.blurry_idx[p]
                all_latent += li
                all_blurry.append(bi)
                sharp_idx = [li[-1]] if self.deblur_pretrain else li
                lat_frames.append(
                    self._frames(sharp_idx).astype(np.float32) / 255.0
                )  # (NumF, H, W, 3)
                blur_frames.append(self._blurry(bi))  # (H, W, 3)
                if self.need_neighbor_gt:
                    nei = []
                    NF = self.num_frame_per_period
                    for k, i in enumerate(li):
                        pair = (
                            [i, i + 1] if k == 0 else [i - 1, i] if k == NF - 1 else [i - 1, i + 1]
                        )
                        nei.append(self._frames(pair).astype(np.float32) / 255.0)
                    nei_frames.append(np.stack(nei))  # (NumF, 2, H, W, 3)
                duty_list.append(self.duty[p])

            latents.append(np.stack(lat_frames))        # (NumP, NumF', H, W, 3)
            blurries.append(np.stack(blur_frames))      # (NumP, H, W, 3)
            if self.need_neighbor_gt:
                neighbors.append(np.stack(nei_frames))  # (NumP, NumF, 2, H, W, 3)
            events.append(self._event_stack(all_latent[0], all_latent[-1]))

            # timestamps normalized by the load interval (h5dataset.py:354-366)
            t0 = all_latent[0]
            lts = (np.asarray(all_latent, np.float32) - t0) / self.interval
            bts = (
                np.asarray([[b[0], b[-1]] for b in all_blurry], np.float32) - t0
            ) / self.interval
            rel = [lts] + [
                lts - 1.0 / (i + 1) for i in range(1, self.num_period_per_load)
            ]
            latent_ts.append(lts)
            rel_ts.append(np.stack(rel))
            blurry_ts.append(bts)
            duties.append(np.asarray(duty_list, np.float32)[:, None])

        item = {
            "latent": np.stack(latents),        # (L, NumP, NumF', H, W, 3)
            "blurry": np.stack(blurries),       # (L, NumP, H, W, 3)
            "events": np.stack(events),         # (L, H, W, 2*TB)
            "latent_ts": np.stack(latent_ts),   # (L, NumP*NumF)
            "relative_ts": np.stack(rel_ts),    # (L, NumP, NumP*NumF)
            "blurry_ts": np.stack(blurry_ts),   # (L, NumP, 2)
            "exposure": np.stack(duties),       # (L, NumP, 1)
        }
        if self.need_neighbor_gt:
            item["neighbor"] = np.stack(neighbors)

        if self.config["data_augment"]["enabled"]:
            spatial = {
                k: item[k] for k in ("latent", "blurry", "events", "neighbor") if k in item
            }
            kinds = {"latent": "frame", "blurry": "frame", "neighbor": "frame", "events": "event"}
            spatial = augment(
                spatial, kinds, self.config["data_augment"], seed, self.spec.gt_resolution
            )
            item.update(spatial)
        return {k: np.ascontiguousarray(v) for k, v in item.items()}


class H5ClipDatasetReal:
    """Real-blur dataset (RealBlur-DAVIS): real blurry frames, no latent GT;
    exposure duty from exposure_begin_t/exposure_end_t attrs
    (dataloader/h5dataset_realdata.py)."""

    def __init__(self, h5_path: str, config: dict):
        self.config = config
        self.h5 = h5py.File(h5_path, "r")
        self.sensor_resolution = tuple(self.h5.attrs["sensor_resolution"][:2])
        self.spec = ScaleSpec.resolve(
            self.sensor_resolution, config["scale"], config["ori_scale"]
        )
        self.time_bins = config["time_bins"]
        self.num_period_per_load = config["NumPeriodPerLoad"]
        interp_num = config.get("interp_num", 16)
        # interpolation targets are linspace(0,1) (h5dataset_realdata.py:112)
        self.relative_ts = np.tile(
            np.linspace(0, 1, interp_num, dtype=np.float32)[None],
            (self.num_period_per_load, 1),
        )
        # last frame dropped: needed for the next-period shutter timestamp
        num_period = len(self.h5["ori_images"].keys()) - 1
        self.seq_indices = compute_seq_windows(
            num_period,
            config["NumPeriodPerSeq"],
            config["SlidingWindowSeq"],
            self.num_period_per_load,
            config["SlidingWindowLoad"],
        )

    def __len__(self) -> int:
        return len(self.seq_indices)

    def _read_frame(self, i: int) -> np.ndarray:
        frame = self.h5["ori_images"][f"image{i:09d}"][:]  # kept as-stored
        if frame.shape[:-1] != tuple(self.spec.gt_resolution):
            frame = cv2.resize(
                frame, self.spec.gt_resolution[::-1], interpolation=cv2.INTER_CUBIC
            )
        return frame

    def _event_stack(self, left: int, right: int) -> np.ndarray:
        prex = self.spec.gt_prefix
        i0 = self.h5["ori_images"][f"image{left:09d}"].attrs[f"{prex}_event_idx"]
        # +1: all events through the end of the last period
        i1 = self.h5["ori_images"][f"image{right + 1:09d}"].attrs[f"{prex}_event_idx"]
        xs = self.h5[f"{prex}_events/xs"][i0:i1]
        ys = self.h5[f"{prex}_events/ys"][i0:i1]
        ts = self.h5[f"{prex}_events/ts"][i0:i1]
        ps = self.h5[f"{prex}_events/ps"][i0:i1]
        if len(xs) == 0:
            xs = ys = ts = ps = np.array([0.0])
        ts = normalize_event_ts(ts)
        stack = _encode_stack(
            xs, ys, ts, ps.astype(np.float64), self.time_bins, self.spec.gt_resolution
        )
        return stack.transpose(2, 3, 1, 0).reshape(
            *self.spec.gt_resolution, 2 * self.time_bins
        )

    def _duty(self, left: int, right: int) -> np.ndarray:
        out = []
        for i in range(left, right + 1):
            img = self.h5["ori_images"]
            b0 = img[f"image{i:09d}"].attrs["exposure_begin_t"]
            b1 = img[f"image{i + 1:09d}"].attrs["exposure_begin_t"]
            e0 = img[f"image{i:09d}"].attrs["exposure_end_t"]
            out.append((e0 - b0) / (b1 - b0))
        return np.asarray(out, np.float32)[:, None]

    def get(self, index: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        if seed is None:
            seed = random.randint(0, 2**32)
        sequence = self.seq_indices[index]
        blurries, events, rel_ts, duties = [], [], [], []
        for (left, right) in sequence:
            frames = np.stack(
                [self._read_frame(i) for i in range(left, right + 1)]
            ).astype(np.float32) / 255.0  # (NumP, H, W, 3)
            blurries.append(frames)
            events.append(self._event_stack(left, right))
            rel_ts.append(self.relative_ts)
            duties.append(self._duty(left, right))
        item = {
            "blurry": np.stack(blurries),      # (L, NumP, H, W, 3)
            "events": np.stack(events),        # (L, H, W, 2*TB)
            "relative_ts": np.stack(rel_ts),   # (L, NumP, interp_num)
            "exposure": np.stack(duties),      # (L, NumP, 1)
        }
        if self.config["data_augment"]["enabled"]:
            spatial = {k: item[k] for k in ("blurry", "events")}
            kinds = {"blurry": "frame", "events": "event"}
            spatial = augment(
                spatial, kinds, self.config["data_augment"], seed, self.spec.gt_resolution
            )
            item.update(spatial)
        return {k: np.ascontiguousarray(v) for k, v in item.items()}
