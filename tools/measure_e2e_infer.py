"""End-to-end inference throughput: the REAL CLI loop at 720p (VERDICT r3 #4).

bench.py measures device-only throughput (pre-staged jnp arrays).  This
tool measures `infer_clip` — the actual `python -m ebfi_tpu.infer` per-clip
loop (infer_ours.py:81-142 equivalent): H5 reads, windowing, on-the-fly
blur synthesis, event encoding (C++ data plane), device forward, metrics,
and PNG writes — and reports wall-clock OUTPUT frames/sec alongside.

Two scenarios:
  eval        synthetic loader with GT: metrics (PSNR/SSIM on host) + GT
              PNGs in the loop — the reference's evaluation run.
  production  real-blur loader (no GT, no metrics): restored + blurry +
              event PNGs only — the deployment scenario the headline
              number describes.

The first pass per scenario warms the jit caches; the reported number is
the second pass into a fresh output dir.

    python tools/measure_e2e_infer.py [--frames 40]
"""
import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/root/repo/.bench_data"


def ensure_clip(path, frames, real):
    from ebfi_tpu.data.synth import write_clip_h5

    if os.path.exists(path):
        return
    os.makedirs(DATA_DIR, exist_ok=True)
    print(f"generating {path} ({frames} frames @720p)...", flush=True)
    write_clip_h5(
        path, num_frames=frames, H=720, W=1280, seed=5,
        real_exposure=(0.5, 0.1) if real else None,
    )


def ensure_ckpt(path):
    if os.path.exists(path):
        return path
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.train.checkpoint import save_checkpoint

    args = dict(
        FrameBasech=64, EventBasech=64, InterCH=64, TB=16,
        BlurryFashion="RGBLap", BLInch=4, UseGTEx=False, step=12,
        DualPath=True, residual=True, DetailEnabled=True,
        channels=[16, 24, 32, 64],
    )
    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 32)), jnp.zeros((1, 1)),
    )
    return save_checkpoint(
        DATA_DIR, os.path.basename(path), params, None, 0,
        {"model": {"name": "EVFIAutoEx", "args": args}}, {"iteration": 0},
    )


def run_scenario(name, clip, engine, cfg, real, out_root, workers=0):
    from ebfi_tpu.infer.cli import infer_clip
    from ebfi_tpu.utils.logger import YamlResultLogger

    # precondition: the windowing config needs enough frames to yield at
    # least one window — check BEFORE burning two full passes (advisor
    # finding, round 4)
    import h5py

    with h5py.File(clip, "r") as f:
        n_frames = int(f.attrs["num_imgs"])
    ds = cfg["dataset"]
    need = ds["NumFramePerPeriod"] * ds["NumPeriodPerSeq"]
    if n_frames < need:
        print(
            f"{name}: clip has {n_frames} frames < "
            f"NumFramePerPeriod*NumPeriodPerSeq = {need}; regenerate with "
            "a larger --frames", flush=True,
        )
        return {"scenario": name, "output_frames": 0, "wall_s": 0.0,
                "fps_e2e": 0.0}

    times = []
    n_out = 0
    for attempt in ("warm", "measured"):
        img_path = os.path.join(out_root, f"{name}_{attempt}", "img")
        shutil.rmtree(os.path.dirname(img_path), ignore_errors=True)
        os.makedirs(img_path)
        logger = YamlResultLogger(
            os.path.join(os.path.dirname(img_path), "inference.yml")
        )
        t0 = time.perf_counter()
        infer_clip(cfg, clip, engine, real, img_path, logger, {"lpips": None},
                   num_workers=workers)
        dt = time.perf_counter() - t0
        times.append(dt)
        n_out = len(glob.glob(os.path.join(img_path, "restored_frame", "*.png")))
    if n_out == 0:
        print(
            f"{name}: ZERO output windows — the clip is too short for the "
            "windowing config (needs >= NumFramePerPeriod*NumPeriodPerSeq "
            "frames); regenerate with a larger --frames", flush=True,
        )
        return {"scenario": name, "output_frames": 0, "wall_s": 0.0,
                "fps_e2e": 0.0}
    fps = n_out / times[-1]
    print(
        f"{name} (workers={workers}): {n_out} output frames in {times[-1]:.2f}s "
        f"(warm pass; first pass incl. compile {times[0]:.2f}s) "
        f"=> {fps:.2f} frames/sec end-to-end", flush=True,
    )
    return {"scenario": name, "workers": workers, "output_frames": n_out,
            "wall_s": round(times[-1], 2), "fps_e2e": round(fps, 2)}


def main():
    ap = argparse.ArgumentParser()
    # default matches the committed fixtures and the documented invocation
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default="/tmp/e2e_infer")
    ap.add_argument("--workers", type=int, default=0,
                    help="fetch-plane worker processes (0 = in-process)")
    ap.add_argument("--scenarios", default="production,eval")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.infer.cli import default_dataloader_config, load_model

    clip = os.path.join(DATA_DIR, f"e2e_720p_{args.frames}.h5")
    real_clip = os.path.join(DATA_DIR, f"e2e_720p_real_{args.frames}.h5")
    ensure_clip(clip, args.frames, real=False)
    ensure_clip(real_clip, args.frames, real=True)
    ckpt = ensure_ckpt(os.path.join(DATA_DIR, "flagship-random-ckpt"))

    _, engine = load_model(ckpt, precision="bf16")

    cfg = default_dataloader_config()
    ds = cfg["dataset"]
    ds.update({
        "scale": 1, "ori_scale": "ori", "time_bins": 16, "interp_num": 16,
        "NumFramePerPeriod": 16, "NumFramePerBlurry": 9,
        "NumPeriodPerSeq": 2, "SlidingWindowSeq": 2,
    })
    ds["data_augment"]["noise"]["enabled"] = False
    ds["data_augment"]["hot_pixel"]["enabled"] = False

    wanted = args.scenarios.split(",")
    results = []
    if "production" in wanted:
        results.append(run_scenario("production", real_clip, engine, cfg,
                                    True, args.out, workers=args.workers))
    if "eval" in wanted:
        results.append(run_scenario("eval", clip, engine, cfg, False,
                                    args.out, workers=args.workers))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
