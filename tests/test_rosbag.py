"""rosbag -> H5 converter, driven with a duck-typed in-memory bag
(no ROS runtime in-image; the extraction logic is bag-agnostic)."""
import os
import sys
from types import SimpleNamespace

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from rosbag_to_h5 import extract_bag, timestamp_float


def rostime(sec_float):
    secs = int(sec_float)
    return SimpleNamespace(secs=secs, nsecs=int(round((sec_float - secs) * 1e9)))


class FakeBag:
    """Yields (topic, msg, t) like rosbag.Bag.read_messages()."""

    def __init__(self, rng, H=16, W=24, n_imgs=4, events_per_msg=200):
        self.msgs = []
        t = 10.0  # non-zero epoch exercises zero_timestamps
        for i in range(n_imgs):
            img_t = t + i * 0.1
            if i > 0:  # event packet between frames
                evs = []
                for _ in range(events_per_msg):
                    evs.append(SimpleNamespace(
                        x=int(rng.integers(0, W)), y=int(rng.integers(0, H)),
                        ts=rostime(img_t - 0.1 + float(rng.uniform(0, 0.1))),
                        polarity=bool(rng.uniform() < 0.5),
                    ))
                evs.sort(key=lambda e: timestamp_float(e.ts))
                self.msgs.append(("/dvs/events", SimpleNamespace(events=evs), None))
            img = SimpleNamespace(
                header=SimpleNamespace(stamp=rostime(img_t)),
                data=(rng.uniform(0, 255, (H, W))).astype(np.uint8),
            )
            self.msgs.append(("/dvs/image_raw", img, None))

    def read_messages(self):
        yield from self.msgs


def test_extract_fake_bag_roundtrip(tmp_path, rng):
    bag = FakeBag(rng)
    out = str(tmp_path / "bag.h5")
    stats = extract_bag(
        bag, out, "/dvs/events", "/dvs/image_raw",
        zero_timestamps=True,
        imgmsg_to_array=lambda msg, color: msg.data,
    )
    assert stats["num_images"] == 4
    assert stats["num_events"] == 600
    assert stats["num_pos"] + stats["num_neg"] == 600
    assert stats["sensor_size"] == (16, 24)

    with h5py.File(out) as h:
        assert tuple(h.attrs["sensor_resolution"]) == (16, 24)
        assert len(h["ori_images"]) == 4
        ts = h["ori_events/ts"][:]
        assert ts.min() >= 0.0 and ts.max() <= 0.31  # zeroed timestamps
        assert np.all(np.diff(ts) >= 0)
        ps = h["ori_events/ps"][:]
        assert set(np.unique(ps)) <= {-1, 1}
        # per-image event indices align with timestamps
        for i in range(4):
            d = h["ori_images"][f"image{i:09d}"]
            idx = int(d.attrs["ori_event_idx"])
            t_img = float(d.attrs["timestamp"])
            assert np.all(ts[:idx] < t_img + 1e-12)
            if idx < len(ts):
                assert ts[idx] >= t_img - 1e-12

    # the converted file loads through the real dataset machinery
    from ebfi_tpu.data.h5dataset import H5ClipDataset

    from test_data import dataset_cfg

    cfg = dataset_cfg(
        time_bins=2, NumFramePerPeriod=2, NumFramePerBlurry=2,
        NumPeriodPerSeq=1, SlidingWindowSeq=1, ExposureMethod="Fixed",
    )
    ds = H5ClipDataset(out, cfg)
    item = ds.get(0, seed=0)
    assert np.isfinite(item["blurry"]).all()
