"""Inference CLI — flag-compatible replacement for the reference's
`infer_ours.py` (flags: infer_ours.py:193-220; output tree and YAML result
files: infer_ours.py:42-153, 368-416).

Per H5 clip in the datalist it writes

    <output_path>/<clip>/img/{blurry_frame,event,gt_frame,restored_frame}/
    <output_path>/<clip>/inference.yml

and aggregates `inference_all.yml` / `inference_all_step.yml` with
per-metric per-dataset breakdowns, means, and per-step PSNR lists.

TPU path: the engine computes the T-independent trunk once per blurry frame
and scans the reconstruction tail over all requested timestamps
(ebfi_tpu/infer/engine.py) — identical outputs to the reference's per-T
full forwards, several times the throughput.
"""
from __future__ import annotations

import argparse
import logging
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from ..data.dataloader import EBFIDataLoader, read_datalist
from ..losses import psnr_metric, ssim_metric, LPIPS, load_lpips_params
from ..models.factory import build_model
from ..train.checkpoint import restore_checkpoint
from ..utils.logger import YamlResultLogger
from ..utils.metrics import MetricTracker
from ..utils.vis import save_frame, save_event_cnt


def default_dataloader_config() -> dict:
    """Mirror of the hardcoded inference config (infer_ours.py:238-287)."""
    return {
        "batch_size": 1,
        "shuffle": False,
        "drop_last": False,
        "dataset": {
            "scale": 4,
            "ori_scale": "down4",
            "time_bins": 1,
            "interp_num": 16,
            "NumFramePerPeriod": 16,
            "NumFramePerBlurry": 9,
            "NumPeriodPerSeq": 2,
            "SlidingWindowSeq": 2,
            "NumPeriodPerLoad": 1,
            "SlidingWindowLoad": 1,
            "ExposureMethod": "Fixed",
            "ExposureTime": None,
            "DeblurPretrain": False,
            "data_augment": {
                "enabled": True,
                "augment": ["RandomCrop", "CenterCrop", "HorizontalFlip",
                            "VertivcalFlip", "Noise", "HotPixel"],
                "random_crop": {"enabled": False, "size": [128, 128]},
                "center_crop": {"enabled": False, "size": [128, 128]},
                "flip": {"enabled": False, "horizontal_prob": 0.5, "vertical_prob": 0.5},
                "noise": {"enabled": True, "noise_std": 1.0, "noise_fraction": 0.05},
                "hot_pixel": {"enabled": True, "hot_pixel_std": 2.0,
                              "hot_pixel_fraction": 0.001},
            },
        },
    }


def get_flags(argv=None):
    p = argparse.ArgumentParser(description="ebfi_tpu inference")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--data_list", type=str, default=None)
    p.add_argument("--device", type=str, default="tpu:0")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--scale", type=int, default=None)
    p.add_argument("--ori_scale", type=str, default=None)
    p.add_argument("--time_bins", type=int, default=None)
    p.add_argument("--interp_num", type=int, default=None)
    p.add_argument("--num_frame_per_period", type=int, default=None)
    p.add_argument("--num_frame_per_blurry", type=int, default=None)
    p.add_argument("--num_period_per_seq", type=int, default=None)
    p.add_argument("--sliding_window_seq", type=int, default=None)
    p.add_argument("--num_period_per_load", type=int, default=None)
    p.add_argument("--sliding_window_load", type=int, default=None)
    p.add_argument("--exposure_method", type=str, default=None)
    p.add_argument("--exposure_time", type=str, default=None)
    p.add_argument("--deblur_pretrain", default=False, action="store_true")
    p.add_argument("--noise_std", type=float, default=None)
    p.add_argument("--noise_enabled", default=True, action="store_false")
    p.add_argument("--center_crop_size", type=int, nargs="+", default=None)
    p.add_argument("--noise_rng", type=str, default="numpy",
                   choices=["numpy", "torch"],
                   help="event-noise RNG: 'torch' reproduces the reference's "
                        "torch.manual_seed noise bit-for-bit (needs torch; "
                        "parity runs), 'numpy' is the torch-free default")
    p.add_argument("--real_blur", default=False, action="store_true")
    p.add_argument("--workers", type=int, default=0,
                   help="worker PROCESSES for the host fetch plane (H5 "
                        "decode + blur synthesis + event encode); 0 = "
                        "in-process threads.  The reference's loader uses "
                        "4 torch workers (infer_ours.py:54-57)")
    p.add_argument("--precision", type=str, default="f32", choices=["f32", "bf16"])
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="path to LPIPS linear-head .pth (optional)")
    p.add_argument("--alexnet_weights", type=str, default=None,
                   help="path to torchvision alexnet state_dict (optional)")
    return p.parse_args(argv)


def apply_flag_overrides(cfg: dict, flags) -> dict:
    ds = cfg["dataset"]
    simple = {
        "scale": "scale", "ori_scale": "ori_scale", "time_bins": "time_bins",
        "interp_num": "interp_num", "num_frame_per_period": "NumFramePerPeriod",
        "num_frame_per_blurry": "NumFramePerBlurry",
        "num_period_per_seq": "NumPeriodPerSeq",
        "sliding_window_seq": "SlidingWindowSeq",
        "num_period_per_load": "NumPeriodPerLoad",
        "sliding_window_load": "SlidingWindowLoad",
        "exposure_method": "ExposureMethod",
    }
    for flag, key in simple.items():
        v = getattr(flags, flag)
        if v is not None:
            ds[key] = v
    if flags.exposure_time is not None:
        ds["ExposureTime"] = (
            [int(x) for x in flags.exposure_time.strip("[]").split(",")]
            if isinstance(flags.exposure_time, str) else flags.exposure_time
        )
    ds["DeblurPretrain"] = flags.deblur_pretrain
    if flags.noise_std is not None:
        ds["data_augment"]["noise"].update(
            {"enabled": True, "noise_std": flags.noise_std, "noise_fraction": 0.05}
        )
    ds["data_augment"]["noise"]["enabled"] = flags.noise_enabled
    ds["data_augment"]["hot_pixel"]["enabled"] = flags.noise_enabled
    ds["data_augment"]["noise"]["rng"] = flags.noise_rng
    if flags.center_crop_size is not None:
        ds["data_augment"]["center_crop"].update(
            {"enabled": True, "size": list(flags.center_crop_size)}
        )
    return cfg


def load_model(model_path: Optional[str], precision: str = "f32"):
    """Rebuild the architecture from the checkpoint-embedded config and
    restore weights (infer_ours.py:156-172)."""
    if model_path is None:
        return None, None
    from .engine import InferenceEngine

    restored = restore_checkpoint(model_path)
    config = restored["meta"]["config"]
    model = build_model(config["model"])
    params = restored["model_states"]
    return model, InferenceEngine(model, {"params": params["params"]}
                                  if "params" in params else params,
                                  precision=precision)


class _AsyncWriter:
    """PNG writes on background threads so host IO overlaps the (async)
    device compute — the reference writes synchronously inside its hot loop
    (infer_ours.py:132-142), which serializes ~33 720p PNG encodes per
    blurry frame with the forward pass.  Errors surface at drain()."""

    def __init__(self, threads: int = 2):
        import concurrent.futures as cf

        self._pool = cf.ThreadPoolExecutor(threads)
        self._futures = []

    def submit(self, fn, *args):
        self._futures.append(self._pool.submit(fn, *args))

    def drain(self):
        for f in self._futures:
            f.result()
        self._futures.clear()
        self._pool.shutdown(wait=True)


def infer_clip(
    dataloader_config: dict,
    data_path: str,
    engine,
    real_blur: bool,
    img_path: str,
    logger: YamlResultLogger,
    metrics: Dict,
    num_workers: int = 0,
) -> Dict:
    """Per-clip loop (infer_body, infer_ours.py:42-153).

    num_workers > 0 moves the host fetch plane (H5 decode, blur synthesis,
    event encoding) into worker processes so it pipelines against the
    device forward, metrics, and PNG encodes — the loop then runs at
    ~max(host, device) rather than host+device."""
    logger.log_dict(dataloader_config, "eval_datasetloader_config")
    loader = EBFIDataLoader(
        data_path,
        dataloader_config["dataset"],
        batch_size=dataloader_config.get("batch_size", 1),
        real_data=real_blur,
        num_workers=num_workers,
    )
    blurry_path = os.path.join(img_path, "blurry_frame")
    event_path = os.path.join(img_path, "event")
    gt_path = os.path.join(img_path, "gt_frame")
    restored_path = os.path.join(img_path, "restored_frame")
    for p in (blurry_path, event_path, gt_path, restored_path):
        os.makedirs(p, exist_ok=False)

    # only track metrics that will actually be computed — a never-updated
    # key would surface as a misleading 0.0 in the result YAMLs
    keys = ["mse", "psnr", "ssim"] + (["lpips"] if metrics.get("lpips") else [])
    track = MetricTracker(keys)
    psnr_steps: List[float] = []

    writer = _AsyncWriter()
    iF = -1

    def emit(iL, finals_dev, num_i, blurry_l, event_l, latent_l):
        """Host-side output processing for one blurry frame: metrics, PNG
        submits.  `finals_dev` are device arrays from a PREVIOUS dispatch —
        by the time this runs the next window's forward is already queued,
        so the np.asarray sync overlaps device compute (software pipeline;
        the reference serializes forward -> metrics -> writes,
        infer_ours.py:105-142)."""
        nonlocal iF
        finals = None if finals_dev is None else np.asarray(finals_dev)
        for i in range(num_i):
            iF += 1
            if finals is not None:
                pred = finals[i]  # (B, H, W, 3)
                if latent_l is not None:
                    gt = latent_l[:, i]
                    # metrics consume CHW tensors like the reference
                    pred_chw = pred.transpose(0, 3, 1, 2)
                    gt_chw = gt.transpose(0, 3, 1, 2)
                    psnr_val = psnr_metric(pred_chw, gt_chw)
                    track.update("psnr", psnr_val)
                    track.update("mse", float(np.mean((pred - gt) ** 2)))
                    track.update("ssim", ssim_metric(pred_chw, gt_chw))
                    if metrics.get("lpips") is not None:
                        track.update("lpips", metrics["lpips"](np.clip(pred, 0, 1), gt))
                    psnr_steps.append(psnr_val)
                writer.submit(
                    save_frame,
                    (np.clip(pred[0], 0, 1) * 255).astype(np.uint8),
                    os.path.join(restored_path, f"{iF:09d}_{iL}.png"),
                )
            if latent_l is not None:
                writer.submit(
                    save_frame,
                    (latent_l[0, i] * 255).astype(np.uint8),
                    os.path.join(gt_path, f"{iF:09d}_{iL}.png"),
                )
        writer.submit(
            save_frame,
            (blurry_l * 255).astype(np.uint8),
            os.path.join(blurry_path, f"{iL:09d}.png"),
        )
        # per-bin polarity renders (infer_ours.py:138-142)
        tb = event_l.shape[-1] // 2
        for b in range(tb):
            writer.submit(
                save_event_cnt,
                np.ascontiguousarray(event_l[..., 2 * b : 2 * b + 2]),
                os.path.join(event_path, f"{iL}_TB{b:09d}.png"),
                "blue_red",
                False,
            )

    iL = -1
    prev = None  # pending emit args for the previously dispatched frame
    for window in loader:
        blurry = window["blurry"]      # (B, L, NumP, H, W, 3)
        events = window["events"]      # (B, L, H, W, 2TB)
        rel_ts = window["relative_ts"] # (B, L, NumP, NumI)
        exposure = window["exposure"]  # (B, L, NumP, 1)
        latent = window.get("latent")
        L = blurry.shape[1]
        for idx_l in range(L):
            iL += 1
            frame = blurry[:, idx_l, 0]
            event = events[:, idx_l]
            ts = rel_ts[:, idx_l, 0]     # (B, NumI)
            gt_ex = exposure[:, idx_l, 0]
            finals_dev = None
            if engine is not None:
                _, finals_dev = engine.interpolate(
                    frame, event, ts, gt_ex, outputs="final"
                )  # async dispatch — returns device arrays immediately
            if prev is not None:
                emit(*prev)
            prev = (
                iL, finals_dev, ts.shape[-1], blurry[0, idx_l, 0], event[0],
                None if latent is None else latent[:, idx_l, 0],
            )
    if prev is not None:
        emit(*prev)

    writer.drain()
    result = track.result()
    out = {"result": result, "result_step": {"psnr": psnr_steps}}
    logger.log_dict(result, "evaluation results")
    logger.log_dict(out["result_step"], "evaluation step results")
    return out


def main(argv=None):
    # the reference seeds everything to 123 before inference
    # (infer_ours.py:419-421); augmentation noise draws per-item seeds from
    # python `random`, so matching runs require the same base seed
    import random

    random.seed(123)
    np.random.seed(123)

    flags = get_flags(argv)
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = apply_flag_overrides(default_dataloader_config(), flags)
    os.makedirs(flags.output_path, exist_ok=True)

    # LPIPS: the linear heads default to the reference's vendored v0.1
    # alex heads (shipped pre-converted); a REAL alexnet backbone must be
    # supplied via --alexnet_weights.  Without one the metric would use
    # random features — self-consistent but meaningless next to published
    # numbers — so it is omitted from the result YAMLs rather than written
    # silently (the reference always has the torchvision backbone:
    # loss/PerceptualSimilarity/models/dist_model.py).
    lpips = None
    if flags.lpips_weights or flags.alexnet_weights:
        lpips = LPIPS(load_lpips_params(flags.lpips_weights, flags.alexnet_weights))
        if not lpips.comparable:
            logging.getLogger(__name__).warning(
                "LPIPS requested without --alexnet_weights: the backbone "
                "would be random features, so LPIPS is omitted from result "
                "files. Provide a torchvision alexnet state_dict to enable it."
            )
            lpips = None
    metrics = {"lpips": lpips}

    model, engine = load_model(flags.model_path, precision=flags.precision)
    data_list = read_datalist(flags.data_list)

    logger_all = YamlResultLogger(os.path.join(flags.output_path, "inference_all.yml"))
    logger_all.log_info(f"inference [{flags.model_path}] \n on {data_list}")
    logger_step = YamlResultLogger(
        os.path.join(flags.output_path, "inference_all_step.yml")
    )

    results = []
    for data_path in data_list:
        data_name = os.path.basename(data_path)
        root = os.path.join(flags.output_path, data_name)
        img_path = os.path.join(root, "img")
        os.makedirs(img_path, exist_ok=False)
        with YamlResultLogger(os.path.join(root, "inference.yml")) as logger:
            logger.log_info(f"inference [{flags.model_path}] on {data_path}")
            r = infer_clip(cfg, data_path, engine, flags.real_blur, img_path,
                           logger, metrics, num_workers=flags.workers)
        r["data_name"] = data_name
        results.append(r)

    # aggregate (infer_ours.py:397-416)
    breakdown = defaultdict(dict)
    means = defaultdict(list)
    step_breakdown = defaultdict(dict)
    step_means = defaultdict(list)
    for entry in results:
        name = entry.pop("data_name")
        for k, v in entry["result"].items():
            breakdown[k][name] = v
            means[k].append(v)
        for k, v in entry["result_step"].items():
            step_breakdown[k][name] = v
            step_means[k].append(v)
    means = {k: float(np.mean(v)) for k, v in means.items()}
    step_means_out = {}
    for k, series in step_means.items():
        if series:
            min_len = min(len(s) for s in series)
            step_means_out[k] = [
                float(np.mean([s[i] for s in series])) for i in range(min_len)
            ]
    logger_all.log_dict(dict(breakdown), "breakdown results for each data")
    logger_all.log_dict(means, "mean results for the whole data")
    logger_all.flush()
    logger_step.log_dict(dict(step_breakdown), "breakdown results for each data")
    logger_step.log_dict(step_means_out, "mean results for the whole data (based on min length)")
    logger_step.flush()


if __name__ == "__main__":
    main()
