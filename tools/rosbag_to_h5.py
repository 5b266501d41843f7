"""DAVIS rosbag -> schema H5 converter.

Functional port of generate_dataset/tools/rosbag_to_h5.py: walks a bag's
event (and optional image) topics, applies the same timestamp handling
(`zero_timestamps` offsets to the first message; start/end windowing;
sensor size inferred from events when not given), and writes OUR H5
schema via ebfi_tpu.data.packager (ori_images/image{idx:09d} with
timestamp attrs + ori_events/{xs,ys,ts,ps} + per-image event indices) —
drop-in for the training pipeline.

The `rosbag`/`cv_bridge` runtimes are not in-image; the extraction logic
is written against a duck-typed bag object (`read_messages()` yielding
(topic, msg, t)) so it is fully testable without ROS, and the CLI opens
real bags when rosbag is importable.

Polarity convention: the reference stores p in {0, 1}
(rosbag_to_h5.py:115); our loader consumes {-1, +1} (h5 schema used by
data/h5dataset.py), so polarities are mapped True->+1 / False->-1.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebfi_tpu.data.packager import H5Packager


def timestamp_float(ts) -> float:
    """ROS time -> float seconds (rosbag_to_h5.py:21-22)."""
    return ts.secs + ts.nsecs / float(1e9)


def extract_bag(
    bag,
    output_path: str,
    event_topic: str,
    image_topic: str | None = None,
    start_time: float | None = None,
    end_time: float | None = None,
    zero_timestamps: bool = False,
    is_color: bool = False,
    sensor_size=None,
    imgmsg_to_array=None,
) -> dict:
    """Extract one (duck-typed) bag into the H5 schema.

    bag.read_messages() must yield (topic, msg, t); event msgs carry
    `.events` with fields x, y, ts, polarity; image msgs are decoded by
    `imgmsg_to_array(msg, is_color)` (defaults to cv_bridge when present).
    Returns summary stats.
    """
    if imgmsg_to_array is None:
        def imgmsg_to_array(msg, color):
            from cv_bridge import CvBridge

            return CvBridge().imgmsg_to_cv2(msg, "bgr8" if color else "mono8")

    pk = H5Packager(output_path)
    topics = (event_topic, image_topic)
    first_ts = -1.0
    xs, ys, ts, ps = [], [], [], []
    images = []  # (timestamp, array)
    num_pos = num_neg = 0
    last_ts = 0.0

    if end_time is None:
        end_time = float("inf")

    for topic, msg, _t in bag.read_messages():
        if first_ts < 0 and topic in topics:
            stamp = msg.events[0].ts if topic == event_topic else msg.header.stamp
            first_ts = timestamp_float(stamp)
            if start_time is None:
                start_time = 0.0 if zero_timestamps else first_ts

        if topic == image_topic:
            timestamp = timestamp_float(msg.header.stamp) - (
                first_ts if zero_timestamps else 0.0
            )
            if start_time <= timestamp <= end_time:
                img = np.asarray(imgmsg_to_array(msg, is_color))
                images.append((timestamp, img))
                sensor_size = img.shape[:2]
        elif topic == event_topic:
            for e in msg.events:
                timestamp = timestamp_float(e.ts) - (first_ts if zero_timestamps else 0.0)
                if start_time <= timestamp <= end_time:
                    xs.append(e.x)
                    ys.append(e.y)
                    ts.append(timestamp)
                    ps.append(1.0 if e.polarity else -1.0)
                    if e.polarity:
                        num_pos += 1
                    else:
                        num_neg += 1
                    last_ts = timestamp

    if sensor_size is None and xs:
        sensor_size = (int(max(ys)) + 1, int(max(xs)) + 1)

    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    ts = np.asarray(ts, np.float64)
    ps = np.asarray(ps, np.float64)
    pk.set_metadata(tuple(sensor_size))
    pk.package_events(xs, ys, ts, ps)
    for timestamp, img in sorted(images, key=lambda p_: p_[0]):
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        pk.package_image(img, timestamp)
    pk.add_event_indices()
    pk.close()
    return {
        "num_events": len(xs),
        "num_pos": num_pos,
        "num_neg": num_neg,
        "num_images": len(images),
        "duration": (last_ts - (start_time or 0.0)) if len(xs) else 0.0,
        "sensor_size": tuple(sensor_size) if sensor_size else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", help="bag file or directory of .bag files")
    p.add_argument("--output_dir", default="/tmp/extracted_data")
    p.add_argument("--event_topic", default="/dvs/events")
    p.add_argument("--image_topic", default=None)
    p.add_argument("--zero_timestamps", action="store_true")
    p.add_argument("--is_color", action="store_true")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--start_time", type=float, default=None)
    p.add_argument("--end_time", type=float, default=None)
    args = p.parse_args(argv)

    try:
        import rosbag
    except ImportError:
        raise SystemExit(
            "rosbag is not installed in this image; use extract_bag() with "
            "your own bag reader, or run the converter in a ROS environment."
        )

    os.makedirs(args.output_dir, exist_ok=True)
    paths = (
        sorted(glob.glob(os.path.join(args.path, "*.bag")))
        if os.path.isdir(args.path)
        else [args.path]
    )
    size = None if args.height is None or args.width is None else (args.height, args.width)
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output_dir, f"{name}.h5")
        with rosbag.Bag(path, "r") as bag:
            stats = extract_bag(
                bag, out, args.event_topic, args.image_topic,
                args.start_time, args.end_time, args.zero_timestamps,
                args.is_color, size,
            )
        print(f"{name}: {stats}")


if __name__ == "__main__":
    main()
