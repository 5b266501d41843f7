"""H5 utilities: txt->H5 conversion, memmap export, inspection, attributes.

Compact port of the reference's converter toolbox
(generate_dataset/tools/{txt_to_h5,h5_to_memmap,read_events,
add_hdf5_attribute}.py).  rosbag conversion is intentionally not ported
(no rosbag runtime in this image); the H5 contract is identical, so H5s
produced by the reference's converter are drop-in.

Subcommands:
  txt-to-h5   : event txt ("t x y p" per line) + optional frame dir -> H5
  to-memmap   : export event arrays of an H5 to .npy memmaps
  inspect     : print schema summary + event/frame counts (read_events)
  add-attr    : set an attribute on the file or a dataset
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebfi_tpu.data.packager import package_sequence


def txt_to_h5(args):
    data = np.loadtxt(args.txt)
    ts, xs, ys, ps = data[:, 0], data[:, 1], data[:, 2], data[:, 3]
    ps = np.where(ps > 0, 1, -1)
    order = np.argsort(ts, kind="stable")
    xs, ys, ts, ps = xs[order], ys[order], ts[order], ps[order]

    if args.frames_dir:
        import cv2

        paths = sorted(glob.glob(os.path.join(args.frames_dir, "*.png")))
        frames = np.stack([cv2.imread(p) for p in paths])
        img_ts = (
            np.loadtxt(args.timestamps).reshape(-1)
            if args.timestamps
            else np.linspace(ts[0], ts[-1], len(paths))
        )
        H, W = frames.shape[1:3]
    else:
        H = int(ys.max()) + 1
        W = int(xs.max()) + 1
        frames = np.zeros((2, H, W, 3), np.uint8)
        img_ts = np.array([ts[0], ts[-1]])
    package_sequence(args.output, frames, img_ts, (xs, ys, ts, ps), (H, W))
    print(f"wrote {args.output}: {len(xs)} events, {len(frames)} frames")


def to_memmap(args):
    os.makedirs(args.output_dir, exist_ok=True)
    with h5py.File(args.h5, "r") as f:
        g = f[f"{args.prefix}_events"]
        for k in ("xs", "ys", "ts", "ps"):
            arr = g[k][:]
            out = os.path.join(args.output_dir, f"{k}.npy")
            np.save(out, arr)
            print(f"{out}: {arr.shape} {arr.dtype}")


def inspect(args):
    with h5py.File(args.h5, "r") as f:
        print("attrs:", dict(f.attrs))
        for name in f:
            item = f[name]
            if isinstance(item, h5py.Group):
                keys = list(item.keys())
                print(f"group {name}: {len(keys)} entries")
                if name.endswith("_events"):
                    ts = item["ts"]
                    print(
                        f"  events: {len(ts)}  t in [{ts[0]:.6f}, {ts[-1]:.6f}]"
                    )
                elif keys[:1]:
                    d = item[keys[0]]
                    print(f"  first: {keys[0]} shape={d.shape} attrs={dict(d.attrs)}")


def add_attr(args):
    with h5py.File(args.h5, "a") as f:
        target = f[args.dataset] if args.dataset else f
        try:
            value = eval(args.value, {"__builtins__": {}})  # numeric/list literals
        except Exception:
            value = args.value
        target.attrs[args.name] = value
        print(f"set {args.name}={value!r} on {args.dataset or '/'}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("txt-to-h5")
    t.add_argument("--txt", required=True)
    t.add_argument("--frames_dir", default=None)
    t.add_argument("--timestamps", default=None)
    t.add_argument("--output", required=True)
    t.set_defaults(fn=txt_to_h5)

    m = sub.add_parser("to-memmap")
    m.add_argument("--h5", required=True)
    m.add_argument("--prefix", default="ori")
    m.add_argument("--output_dir", required=True)
    m.set_defaults(fn=to_memmap)

    i = sub.add_parser("inspect")
    i.add_argument("--h5", required=True)
    i.set_defaults(fn=inspect)

    a = sub.add_parser("add-attr")
    a.add_argument("--h5", required=True)
    a.add_argument("--dataset", default=None)
    a.add_argument("--name", required=True)
    a.add_argument("--value", required=True)
    a.set_defaults(fn=add_attr)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
