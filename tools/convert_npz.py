"""Convert RealSharp-DAVIS-style (npz events + png frames) into schema H5.

Port of generate_dataset/convert_unknown.py:1-59: per-sequence npz event
arrays (x, y, t, p) + frame PNGs with timestamp files -> one H5 with
exposure attrs when provided.

Usage:
  python tools/convert_npz.py --events events.npz --frames_dir frames/ \
      --timestamps ts.txt --output out.h5 [--exposures exp.txt]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebfi_tpu.data.packager import package_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True, help="npz with x, y, t, p arrays")
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--timestamps", required=True, help="one timestamp per line")
    p.add_argument("--exposures", default=None,
                   help="optional 'begin end' per line for real-blur attrs")
    p.add_argument("--output", required=True)
    flags = p.parse_args()

    import cv2

    ev = np.load(flags.events)
    xs, ys, ts, ps = (np.asarray(ev[k]).reshape(-1) for k in ("x", "y", "t", "p"))
    order = np.argsort(ts, kind="stable")
    xs, ys, ts, ps = xs[order], ys[order], ts[order], ps[order]
    ps = np.where(ps > 0, 1, -1)

    paths = sorted(glob.glob(os.path.join(flags.frames_dir, "*.png")))
    frames = np.stack([cv2.imread(p_) for p_ in paths])
    img_ts = np.loadtxt(flags.timestamps).reshape(-1)
    assert len(img_ts) == len(frames), "timestamp count != frame count"

    exposures = None
    if flags.exposures:
        arr = np.loadtxt(flags.exposures).reshape(-1, 2)
        exposures = [tuple(row) for row in arr]

    H, W = frames.shape[1:3]
    package_sequence(flags.output, frames, img_ts, (xs, ys, ts, ps), (H, W),
                     exposures=exposures)
    print(f"wrote {flags.output}: {len(frames)} frames, {len(xs)} events")


if __name__ == "__main__":
    main()
