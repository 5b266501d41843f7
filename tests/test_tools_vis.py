"""H5 utility tools and visualization writers."""
import os
import subprocess
import sys

import h5py
import numpy as np

from ebfi_tpu.utils.vis import (
    save_frame,
    save_event_cnt,
    save_event_stack_grid,
    plot_event_cloud_3d,
    render_event_cnt,
    stack_to_cnt,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H5_UTILS = os.path.join(ROOT, "tools", "h5_utils.py")


def test_txt_to_h5_and_inspect(tmp_path, rng):
    n = 500
    ts = np.sort(rng.uniform(0, 1, n))
    xs = rng.integers(0, 32, n)
    ys = rng.integers(0, 24, n)
    ps = rng.choice([-1, 1], n)
    txt = tmp_path / "events.txt"
    np.savetxt(txt, np.stack([ts, xs, ys, ps], axis=1))
    out = tmp_path / "out.h5"
    r = subprocess.run(
        [sys.executable, H5_UTILS, "txt-to-h5", "--txt", str(txt), "--output", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    with h5py.File(out) as f:
        assert len(f["ori_events/ts"]) == n
        assert "ori_event_idx" in f["ori_images"]["image000000000"].attrs

    r = subprocess.run(
        [sys.executable, H5_UTILS, "inspect", "--h5", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "ori_events" in r.stdout

    md = tmp_path / "mm"
    r = subprocess.run(
        [sys.executable, H5_UTILS, "to-memmap", "--h5", str(out), "--output_dir", str(md)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    assert np.load(md / "ts.npy").shape == (n,)

    r = subprocess.run(
        [sys.executable, H5_UTILS, "add-attr", "--h5", str(out),
         "--name", "source", "--value", "'test'"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    with h5py.File(out) as f:
        assert f.attrs["source"] == "test"


def test_vis_writers(tmp_path, rng):
    frame = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
    save_frame(frame, str(tmp_path / "f.png"))
    cnt = rng.integers(0, 5, (16, 20, 2)).astype(np.float32)
    for scheme in ("green_red", "blue_red", "gray"):
        img = render_event_cnt(cnt, scheme)
        assert img.shape == (16, 20, 3) and img.min() >= 0 and img.max() <= 1
    save_event_cnt(cnt, str(tmp_path / "c.png"))
    stack = rng.integers(0, 4, (16, 20, 8)).astype(np.float32)
    save_event_stack_grid(stack, str(tmp_path / "grid.png"))
    assert stack_to_cnt(stack).shape == (16, 20, 2)
    n = 300
    plot_event_cloud_3d(
        rng.integers(0, 20, n), rng.integers(0, 16, n),
        np.sort(rng.uniform(0, 1, n)), rng.choice([-1, 1], n),
        str(tmp_path / "cloud.png"),
    )
    for name in ("f.png", "c.png", "grid.png", "cloud.png"):
        assert (tmp_path / name).exists()


def test_event_stack_movie(tmp_path, rng):
    from ebfi_tpu.utils.vis import save_event_stack_movie

    stack = np.abs(rng.standard_normal((2, 16, 24, 8))).astype(np.float32)
    out = tmp_path / "stack.gif"
    save_event_stack_movie(stack, str(out), fps=4)
    assert out.exists() and out.stat().st_size > 100


def test_event_cloud_movie(tmp_path, rng):
    from ebfi_tpu.utils.vis import save_event_cloud_movie

    wins = []
    for _ in range(2):
        n = 500
        wins.append((
            rng.integers(0, 32, n), rng.integers(0, 24, n),
            np.sort(rng.uniform(0, 1, n)),
            np.where(rng.uniform(size=n) < 0.5, -1, 1),
        ))
    frames = [rng.uniform(0, 1, (24, 32)) for _ in range(2)]
    out = tmp_path / "cloud.gif"
    save_event_cloud_movie(wins, str(out), frames_panel=frames)
    assert out.exists() and out.stat().st_size > 100


def test_flow_visualization_store(tmp_path, rng):
    from ebfi_tpu.utils.flow_vis import FlowVisualization, flow_to_image, minmax_norm

    H, W = 20, 28
    viz = FlowVisualization(str(tmp_path / "viz"))
    for ts in (0.0, 0.1):
        viz.store(
            event_cnt=np.abs(rng.standard_normal((H, W, 2))).astype(np.float32),
            flow=rng.standard_normal((H, W, 2)).astype(np.float32),
            iwe=np.abs(rng.standard_normal((H, W, 2))).astype(np.float32),
            brightness=rng.uniform(0, 1, (H, W)).astype(np.float32),
            sequence="seq0",
            frames=(rng.uniform(0, 255, (H, W))).astype(np.uint8),
            ts=ts,
        )
    viz.close()
    root = tmp_path / "viz" / "seq0"
    for sub in ("events", "flow", "frames", "iwe", "brightness"):
        assert len(list((root / sub).glob("*.png"))) == 2, sub
    assert (root / "timestamps.txt").read_text().splitlines() == ["0.0", "0.1"]

    img = flow_to_image(np.ones((4, 4)), np.zeros((4, 4)))
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    assert minmax_norm(np.arange(100.0)).max() <= 1.0
