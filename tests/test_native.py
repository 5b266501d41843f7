"""C++ host data plane: build + parity with the numpy encoders."""
import os
import subprocess

import numpy as np
import pytest

import ebfi_tpu.native as native
from ebfi_tpu.data.encodings import events_to_stack_np, normalize_event_ts

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    so = os.path.join(ROOT, "ebfi_tpu", "native", "libebfi_host.so")
    if not os.path.exists(so):
        subprocess.run(
            ["bash", os.path.join(ROOT, "ebfi_tpu", "native", "build.sh")], check=True
        )
    # reset the lazy loader in case an earlier test imported before the build
    native._TRIED = False
    native._LIB = None
    assert native.available()


def test_events_to_stack_parity(rng):
    n, H, W, TB = 700, 24, 32, 8
    xs = rng.integers(-2, W + 2, n).astype(np.float64)  # includes OOB
    ys = rng.integers(-2, H + 2, n).astype(np.float64)
    ts = normalize_event_ts(np.sort(rng.uniform(0, 1, n)))
    ps = rng.choice([-1.0, 1.0], n)
    ref = events_to_stack_np(xs, ys, ts, ps, TB, (H, W))
    got = native.events_to_stack_native(xs, ys, ts, ps, TB, (H, W))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_events_to_stack_degenerate():
    z = np.zeros(3)
    out = native.events_to_stack_native(z, z, z, z, 4, (8, 8))
    assert out.shape == (2, 4, 8, 8) and out.sum() == 0


def test_blurry_mean_parity(rng):
    frames = rng.integers(0, 256, (5, 16, 20, 3)).astype(np.uint8)  # BGR
    got = native.blurry_mean_native(frames)
    ref = frames[:, :, :, ::-1].astype(np.float32).mean(0) / 255.0
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_dataset_uses_native(tmp_path, rng):
    """End to end: dataset items identical with and without the native path."""
    from ebfi_tpu.data.synth import write_clip_h5
    from ebfi_tpu.data.h5dataset import H5ClipDataset
    from test_data import dataset_cfg

    path = str(tmp_path / "clip.h5")
    write_clip_h5(path, num_frames=24, H=32, W=32, seed=1)
    ds = H5ClipDataset(path, dataset_cfg())
    item_native = ds.get(0, seed=3)

    native._LIB = None  # force numpy fallback
    native._TRIED = True
    try:
        item_np = H5ClipDataset(path, dataset_cfg()).get(0, seed=3)
    finally:
        native._TRIED = False
    for k in item_native:
        np.testing.assert_allclose(item_native[k], item_np[k], atol=1e-6, err_msg=k)
