"""End-to-end inference CLI: checkpoint -> datalist -> output tree + YAML."""
import os

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

from ebfi_tpu.data.synth import write_clip_h5
from ebfi_tpu.models.factory import build_model
from ebfi_tpu.train import build_optimizer, create_train_state
from ebfi_tpu.train.checkpoint import save_checkpoint
from ebfi_tpu.infer.cli import main as infer_main


MODEL_CFG = {
    "name": "EVFIAutoEx",
    "args": {
        # reference-style keys (config/train_ours.yml) exercised on purpose
        "FrameBasech": 8,
        "EventBasech": 8,
        "InterCH": 8,
        "TB": 4,
        "UseGTEx": True,
        "step": 2,
        "DetailEnabled": True,
        "channels": [4, 6, 8, 12],
    },
}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    model = build_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 8)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-4}})
    state = create_train_state(model, params, tx)
    path = save_checkpoint(
        str(d), "checkpoint-iteration10", state.params, state.opt_state, 10,
        {"model": MODEL_CFG}, {"iteration": 10},
    )
    return path


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5") / "testclip.h5")
    write_clip_h5(path, num_frames=32, H=32, W=32, seed=9)
    return path


def test_cli_end_to_end(ckpt, clip, tmp_path):
    datalist = tmp_path / "list.txt"
    datalist.write_text(clip + "\n")
    out = tmp_path / "out"
    infer_main([
        "--model_path", ckpt,
        "--data_list", str(datalist),
        "--output_path", str(out),
        "--scale", "1",
        "--ori_scale", "ori",
        "--time_bins", "4",
        "--num_frame_per_period", "8",
        "--num_frame_per_blurry", "5",
        "--num_period_per_seq", "1",
        "--sliding_window_seq", "1",
        "--num_period_per_load", "1",
        "--sliding_window_load", "1",
        "--exposure_method", "Fixed",
        "--noise_enabled",
    ])
    clip_dir = out / "testclip.h5" / "img"
    restored = list((clip_dir / "restored_frame").glob("*.png"))
    gt = list((clip_dir / "gt_frame").glob("*.png"))
    blurry = list((clip_dir / "blurry_frame").glob("*.png"))
    events = list((clip_dir / "event").glob("*.png"))
    # 3 periods (32 frames / 8, minus boundary) x 8 timestamps
    assert len(restored) == len(gt) and len(restored) > 0
    assert len(blurry) > 0 and len(events) == len(blurry) * 4

    agg = yaml.safe_load((out / "inference_all.yml").read_text())
    assert "mean results for the whole data" in agg
    means = agg["mean results for the whole data"]
    assert np.isfinite(means["psnr"]) and 0 <= means["ssim"] <= 1
    per_clip = yaml.safe_load(
        (out / "testclip.h5" / "inference.yml").read_text()
    )
    assert "evaluation results" in per_clip

    step = yaml.safe_load((out / "inference_all_step.yml").read_text())
    steps = step["mean results for the whole data (based on min length)"]["psnr"]
    # per-frame PSNR across the whole clip (3 periods x 8 timestamps),
    # like the reference's metric_step accumulation (infer_ours.py:72-125)
    assert len(steps) == 24


def test_cli_real_blur(ckpt, tmp_path):
    real = tmp_path / "real.h5"
    write_clip_h5(str(real), num_frames=16, H=32, W=32, seed=4, real_exposure=(0.5, 0.05))
    datalist = tmp_path / "rlist.txt"
    datalist.write_text(str(real) + "\n")
    out = tmp_path / "rout"
    infer_main([
        "--model_path", ckpt,
        "--data_list", str(datalist),
        "--output_path", str(out),
        "--scale", "1",
        "--ori_scale", "ori",
        "--time_bins", "4",
        "--interp_num", "6",
        "--num_period_per_seq", "1",
        "--sliding_window_seq", "1",
        "--num_period_per_load", "1",
        "--sliding_window_load", "1",
        "--noise_enabled",
        "--real_blur",
    ])
    clip_dir = out / "real.h5" / "img"
    restored = list((clip_dir / "restored_frame").glob("*.png"))
    assert len(restored) > 0
    assert len(restored) % 6 == 0  # interp_num frames per period
    assert not list((clip_dir / "gt_frame").glob("*.png"))  # no GT for real data


def test_cli_workers_match_inprocess(ckpt, clip, tmp_path):
    """--workers 2 (process fetch plane + pipelined device dispatch) writes
    bit-identical outputs and metrics to the in-process run."""
    datalist = tmp_path / "wlist.txt"
    datalist.write_text(clip + "\n")
    flags = [
        "--model_path", ckpt,
        "--data_list", str(datalist),
        "--scale", "1", "--ori_scale", "ori", "--time_bins", "4",
        "--num_frame_per_period", "8", "--num_frame_per_blurry", "5",
        "--num_period_per_seq", "1", "--sliding_window_seq", "1",
        "--num_period_per_load", "1", "--sliding_window_load", "1",
        "--exposure_method", "Fixed", "--noise_enabled",
    ]
    outs = {}
    for tag, extra in (("w0", []), ("w2", ["--workers", "2"])):
        out = tmp_path / f"out_{tag}"
        infer_main(flags + ["--output_path", str(out)] + extra)
        outs[tag] = out

    import yaml

    r0 = yaml.safe_load((outs["w0"] / "inference_all.yml").read_text())
    r2 = yaml.safe_load((outs["w2"] / "inference_all.yml").read_text())
    assert (
        r0["mean results for the whole data"]
        == r2["mean results for the whole data"]
    )
    d0 = outs["w0"] / "testclip.h5" / "img" / "restored_frame"
    d2 = outs["w2"] / "testclip.h5" / "img" / "restored_frame"
    names0 = sorted(p.name for p in d0.glob("*.png"))
    names2 = sorted(p.name for p in d2.glob("*.png"))
    assert names0 == names2 and names0
    for n in names0:
        assert (d0 / n).read_bytes() == (d2 / n).read_bytes(), n
