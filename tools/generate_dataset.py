"""Offline dataset generation: frame sequences -> schema H5 clips.

Functional port of the reference's generation stage
(generate_dataset/syn_gopro.py + tools/event_packagers.py): reads a
directory of frame folders (e.g. GoPro 240fps PNG sequences), simulates
events with randomized per-sequence contrast thresholds
(syn_gopro.py:15-27: Cp/Cn ~ U[0.2, 0.5]), and packages multiscale H5.

The reference simulates with esim_py and SuperSloMo-upsamples first
(generate_dataset/upsampling/utils/upsampler.py:160-210):
- event simulation uses the built-in ESIM-lite threshold-crossing
  simulator (ebfi_tpu/data/synth.py) with the reference's per-sequence
  threshold sampling (Cp ~ U[CT_range], Cn = gauss(mu, sigma)*Cp, both
  clamped; syn_gopro.py:104-118) and refractory period (1e-4 s,
  syn_gopro.py:17);
- adaptive upsampling: pass `--slomo_ckpt SuperSloMo.ckpt` to use the
  JAX SuperSloMo port (ebfi_tpu/models/superslomo.py; per-pair insertion
  count = ceil(max flow magnitude), exactly the reference's policy), or
  `--upsample_factor N` for fixed-rate linear interpolation.

Usage:
  python tools/generate_dataset.py --input_dir /path/to/seqs \
      --output_dir /path/to/h5 --fps 240 [--slomo_ckpt SuperSloMo.ckpt]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebfi_tpu.data.packager import package_sequence
from ebfi_tpu.data.synth import sample_thresholds, simulate_events


def read_frames(seq_dir: str):
    import cv2

    paths = sorted(
        glob.glob(os.path.join(seq_dir, "*.png")) + glob.glob(os.path.join(seq_dir, "*.jpg"))
    )
    return np.stack([cv2.imread(p) for p in paths])  # BGR


def upsample_linear(frames: np.ndarray, factor: int) -> np.ndarray:
    """Cheap temporal upsampling between consecutive frames."""
    if factor <= 1:
        return frames
    out = []
    for i in range(len(frames) - 1):
        a, b = frames[i].astype(np.float32), frames[i + 1].astype(np.float32)
        for k in range(factor):
            w = k / factor
            out.append(((1 - w) * a + w * b).astype(np.uint8))
    out.append(frames[-1])
    return np.stack(out)


def upsample_slomo(frames: np.ndarray, ts: np.ndarray, ckpt: str):
    """Adaptive SuperSloMo upsampling (upsampler.py:100-134 policy)."""
    from ebfi_tpu.models.superslomo import SuperSloMo, convert_torch_checkpoint

    slomo = SuperSloMo(convert_torch_checkpoint(ckpt))
    up, up_ts = slomo.upsample_sequence(frames.astype(np.float32) / 255.0, ts)
    return (up * 255.0 + 0.5).astype(np.uint8), np.asarray(up_ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True, help="dir of sequence dirs")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--fps", type=float, default=240.0)
    p.add_argument("--upsample_factor", type=int, default=1)
    p.add_argument("--slomo_ckpt", default=None,
                   help="SuperSloMo.ckpt for adaptive upsampling")
    p.add_argument("--contrast_min", type=float, default=0.2)
    p.add_argument("--contrast_max", type=float, default=0.5)
    p.add_argument("--ct_mu", type=float, default=1.0,
                   help="mean of the Cn/Cp gaussian (syn_gopro.py:23)")
    p.add_argument("--ct_sigma", type=float, default=0.1,
                   help="stddev of the Cn/Cp gaussian (syn_gopro.py:24)")
    p.add_argument("--refractory", type=float, default=1e-4,
                   help="per-pixel refractory period in seconds "
                        "(syn_gopro.py:17)")
    p.add_argument("--seed", type=int, default=0)
    flags = p.parse_args()

    os.makedirs(flags.output_dir, exist_ok=True)
    rng = np.random.default_rng(flags.seed)
    seqs = sorted(d for d in glob.glob(os.path.join(flags.input_dir, "*")) if os.path.isdir(d))
    for seq in seqs:
        name = os.path.basename(seq)
        out = os.path.join(flags.output_dir, f"{name}.h5")
        frames = read_frames(seq)
        if flags.slomo_ckpt:
            ts0 = np.arange(len(frames)) / flags.fps
            frames, ts = upsample_slomo(frames, ts0, flags.slomo_ckpt)
        else:
            frames = upsample_linear(frames, flags.upsample_factor)
            ts = np.arange(len(frames)) / (flags.fps * flags.upsample_factor)
        # randomized per-sequence per-polarity thresholds (syn_gopro.py:104-118)
        cp, cn = sample_thresholds(
            rng, (flags.contrast_min, flags.contrast_max),
            flags.ct_mu, flags.ct_sigma,
        )
        rgb = frames[:, :, :, ::-1]
        (xs, ys, ets, ps), _ = simulate_events(
            rgb, ts, seed=flags.seed, cp=cp, cn=cn,
            refractory_period=flags.refractory,
        )
        H, W = frames.shape[1:3]
        package_sequence(out, frames, ts, (xs, ys, ets, ps), (H, W))
        print(f"{name}: {len(frames)} frames, {len(xs)} events "
              f"(Cp={cp:.2f}, Cn={cn:.2f}) -> {out}")


if __name__ == "__main__":
    main()
