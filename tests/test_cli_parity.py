"""END-TO-END CLI parity: the reference's own `infer_ours.py` vs ours.

This is the full-harness version of test_reference_parity.py: instead of
comparing model classes, it drives `/root/reference/infer_ours.py`'s real
`main()` (H5 windowing -> event slicing -> on-the-fly blur synthesis ->
forward -> skimage-convention metrics -> YAML aggregation -> PNG dumps,
infer_ours.py:42-153,368-416) on CPU under import shims
(tests/ref_cli_driver.py), and diffs every artifact against
`python -m ebfi_tpu.infer` run with the same flags on the same clip with
the converted checkpoint:

- per-frame restored PNGs (uint8; tolerance 1 for float->uint8 boundary
  crossings between torch-CPU and XLA-CPU forwards),
- GT and blurry PNGs (bit-exact — pure data-pipeline output),
- inference_all.yml PSNR/SSIM/MSE means and the per-step PSNR list.

The model checkpoint is synthetic (reference parameter names, loaded
strict) and the forward exercises the full default path: DetailEnabled,
UseGTEx=False (exposure estimated by ExposureDecision from the RGBLap
blurriness map), FAC K=5.
"""
import os
import subprocess
import sys
import glob

import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_checkpoint import convert_evfi_state_dict

from test_torch_parity import C, TB, STEP, CHANNELS, make_state_dict

REF_ARGS = dict(
    FrameBasech=C, EventBasech=C, InterCH=C, TB=TB,
    BlurryFashion="RGBLap", BLInch=4, UseEvents=True, UseGTEx=False,
    FixEx=None, step=STEP, DualPath=True, residual=True,
    DetailEnabled=True, channels=list(CHANNELS),
)

DATASET_FLAGS = [
    "--scale", "1",
    "--ori_scale", "ori",
    "--time_bins", str(TB),
    "--num_frame_per_period", "8",
    "--num_frame_per_blurry", "5",
    "--num_period_per_seq", "2",
    "--sliding_window_seq", "2",
    "--num_period_per_load", "1",
    "--sliding_window_load", "1",
    "--exposure_method", "Fixed",
    "--noise_enabled",  # store_false: disables event noise on both CLIs
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipar")
    from ebfi_tpu.data.synth import write_clip_h5

    clip = str(d / "parclip.h5")
    write_clip_h5(clip, num_frames=32, H=32, W=32, seed=9)
    datalist = d / "list.txt"
    datalist.write_text(clip + "\n")

    sd = make_state_dict(np.random.default_rng(17))

    # reference-format torch checkpoint (infer_ours.load_model:156-172
    # rebuilds the arch from the checkpoint-embedded config via eval)
    torch_ckpt = str(d / "ref_ckpt.pth")
    torch.save(
        {
            "config": {"model": {"name": "EVFIAutoEx", "args": REF_ARGS}},
            "model": {"name": "EVFIAutoEx", "states":
                      {k: torch.from_numpy(v) for k, v in sd.items()}},
        },
        torch_ckpt,
    )

    # converted checkpoint in our format
    from ebfi_tpu.train.checkpoint import save_checkpoint

    params = convert_evfi_state_dict(sd, step=STEP)
    ours_ckpt = save_checkpoint(
        str(d), "converted-ckpt", params, None, 0,
        {"model": {"name": "EVFIAutoEx", "args": REF_ARGS}}, {"iteration": 0},
    )
    return {"dir": d, "clip": clip, "datalist": str(datalist),
            "torch_ckpt": torch_ckpt, "ours_ckpt": ours_ckpt}


def _load_pngs(path):
    import cv2

    out = {}
    for p in sorted(glob.glob(os.path.join(path, "*.png"))):
        out[os.path.basename(p)] = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    return out


def test_infer_cli_matches_reference_cli(workdir):
    d = workdir["dir"]
    ref_out = str(d / "ref_out")
    ours_out = str(d / "ours_out")

    # 1) the reference CLI, in a clean subprocess (no jax -> torch workers
    #    fork safely), shims documented in ref_cli_driver.py
    driver = os.path.join(os.path.dirname(__file__), "ref_cli_driver.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, driver,
         "--model_path", workdir["torch_ckpt"],
         "--data_list", workdir["datalist"],
         "--output_path", ref_out,
         "--device", "cpu", *DATASET_FLAGS],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd="/root/reference",
    )
    assert res.returncode == 0, f"reference CLI failed:\n{res.stdout}\n{res.stderr}"

    # 2) our CLI, in-process
    from ebfi_tpu.infer.cli import main as infer_main

    infer_main([
        "--model_path", workdir["ours_ckpt"],
        "--data_list", workdir["datalist"],
        "--output_path", ours_out,
        *DATASET_FLAGS,
    ])

    clip_name = os.path.basename(workdir["clip"])
    ref_img = os.path.join(ref_out, clip_name, "img")
    our_img = os.path.join(ours_out, clip_name, "img")

    # ---- per-frame artifacts ---------------------------------------- #
    for sub, tol in (("gt_frame", 0), ("blurry_frame", 0), ("restored_frame", 1)):
        ref_pngs = _load_pngs(os.path.join(ref_img, sub))
        our_pngs = _load_pngs(os.path.join(our_img, sub))
        assert ref_pngs, f"reference produced no {sub} PNGs"
        assert set(ref_pngs) == set(our_pngs), (
            f"{sub}: filename sets differ: {sorted(ref_pngs)[:4]} vs "
            f"{sorted(our_pngs)[:4]}"
        )
        for name, ref_arr in ref_pngs.items():
            our_arr = our_pngs[name]
            assert ref_arr.shape == our_arr.shape, (sub, name)
            diff = np.abs(ref_arr.astype(np.int16) - our_arr.astype(np.int16))
            assert diff.max() <= tol, (
                f"{sub}/{name}: max uint8 diff {diff.max()} > {tol}"
            )

    # ---- metrics YAML ------------------------------------------------ #
    # the reference's Logger_yaml plain-dumps pandas/numpy scalars, so its
    # YAML carries python/object/apply numpy tags -> unsafe_load (our own
    # artifact, generated just above)
    ref_all = yaml.unsafe_load(open(os.path.join(ref_out, "inference_all.yml")))
    our_all = yaml.safe_load(open(os.path.join(ours_out, "inference_all.yml")))
    ref_means = ref_all["mean results for the whole data"]
    our_means = our_all["mean results for the whole data"]
    assert abs(ref_means["psnr"] - our_means["psnr"]) < 1e-2
    assert abs(ref_means["ssim"] - our_means["ssim"]) < 1e-4
    assert abs(ref_means["mse"] - our_means["mse"]) < 1e-6
    # lpips: reference computes a stubbed 0.0 (backbone unobtainable in
    # image); ours omits the non-comparable value — both "no value"

    ref_step = yaml.unsafe_load(
        open(os.path.join(ref_out, "inference_all_step.yml"))
    )["mean results for the whole data (based on min length)"]["psnr"]
    our_step = yaml.safe_load(
        open(os.path.join(ours_out, "inference_all_step.yml"))
    )["mean results for the whole data (based on min length)"]["psnr"]
    assert len(ref_step) == len(our_step)
    np.testing.assert_allclose(np.asarray(our_step), np.asarray(ref_step),
                               atol=1e-2)
