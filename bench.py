"""Headline benchmark: 1280x720 interpolation throughput (frames/sec/chip).

The benchmark task mirrors the reference's inference hot loop
(infer_ours.py:81-142): one blurry 720p frame + its 16-bin event stack ->
NumI=16 sharp latent frames.  Throughput counts OUTPUT frames per second.
Our engine computes the T-independent trunk once and scans the tail over
timestamps (identical outputs to per-T full forwards; see
ebfi_tpu/infer/engine.py).

Baseline: the reference repo publishes no numbers (BASELINE.md: "reference
provides machinery, not numbers"), so the comparison constant is an
analytic estimate of the reference on A100, with the FLOP side anchored by
XLA's cost model (tools/cost_analysis.py -> COST_ANALYSIS.md):

- per output frame it re-runs the ENTIRE network (train_ours.py:245-256,
  infer_ours.py:105-118): see COST_ANALYSIS.md for the measured
  full-forward TFLOP at 720p;
- torch fp32 convs on A100 (19.5 TF/s peak; TF32 was NOT enabled by
  default in the torch era pinned by the vendored THC build) typically
  sustain 30-60% on this 64-channel conv mix -> 6-12 TF/s;
- plus the in-forward GPU->CPU cv2 blurriness round-trip
  (myutils/utils.py:34-49) and per-frame python dispatch, ~20-50 ms.

=> an estimate RANGE of ~2.2-5 frames/sec/A100 (COST_ANALYSIS.md puts the
pure-compute estimate at 2.2-3.8 fps; 5.0 additionally credits the
reference with best-case overheads).  The emitted JSON carries the full
uncertainty: `vs_baseline` divides by REF_A100_FPS_RANGE[1] = 5.0 — the
FAVORABLE end for the reference, so it is a conservative lower bound —
and `vs_baseline_range` spans [fps/5.0, fps/2.2].  The north-star
"2x A100" corresponds to vs_baseline >= 2.0.
"""
import json
import sys
import time

import numpy as np

# [low, high] frames/sec for the reference on A100; see module docstring
# and COST_ANALYSIS.md for the derivation of each end.
REF_A100_FPS_RANGE = (2.2, 5.0)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.infer import InferenceEngine

    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
    )
    rng = np.random.default_rng(0)
    B, H, W, TB, NUM_I = 1, 720, 1280, 16, 16
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(
        np.abs(rng.standard_normal((B, H, W, 2 * TB))).astype(np.float32)
    )
    ts = jnp.asarray(np.linspace(0, 1, NUM_I, dtype=np.float32)[None].repeat(B, 0))
    params = model.init(
        jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts[:, :1]
    )
    engine = InferenceEngine(model, params, precision="bf16")

    def run_once():
        # outputs='final' mirrors the reference loop, which discards the
        # coarse sharp estimate (infer_ours.py:113-118).  Host-read sync:
        # through the axon tunnel block_until_ready does not actually wait
        # for execution; a scalar device_get does.
        _, final = engine.interpolate(frame, event, ts, outputs="final")
        return float(final.sum())

    run_once()  # warmup / compile

    # The axon tunnel adds a flat ~26-50 ms artifact to every host-read
    # sync AND comparable dead time per queued dispatch (measured round 3:
    # queue-pipelining does not avoid it), so per-call timing of a
    # ~300 ms program overstates its cost by 2-3 floors.  Headline
    # methodology (same as every tools/profile_* in this repo): REPS
    # serial engine evaluations inside ONE program — a lax.scan whose
    # per-step inputs depend on the carry (no hoisting) and whose carry
    # consumes a full reduction of the output (no DCE) — one host-read
    # sync, floor subtracted once.  This is the device-side throughput of
    # the exact production program; deployment pipelines windows
    # back-to-back the same way (infer/cli.py --workers).  The per-call
    # number (every tunnel artifact included) is emitted as fps_raw.
    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    sync_floor = (time.perf_counter() - t0) / 10

    from jax import lax

    inner = engine._multi_cache[("batched", "final")]
    REPS = 6

    @jax.jit
    def run_scan(frame_, event_, ts_, gt_):
        def body(c, _):
            _, fin = inner(frame_, event_, ts_ + (c * 1e-30).astype(ts_.dtype), gt_)
            return jnp.sum(fin.astype(jnp.float32)) * 1e-30 + c * 0.5, None

        return lax.scan(body, jnp.float32(0.0), None, length=REPS)[0]

    gt0 = jnp.zeros((B, 1), frame.dtype)
    float(run_scan(frame, event, ts, gt0))  # compile
    dt_scan = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_scan(frame, event, ts, gt0))
        dt_scan = min(dt_scan, time.perf_counter() - t0)
    dt = max((dt_scan - sync_floor) / REPS, 1e-9)
    fps = NUM_I * B / dt

    # per-call raw: 3 batches, best batch (sporadic multi-ms interference)
    iters = 5
    dt_raw = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            run_once()
        dt_raw = min(dt_raw, (time.perf_counter() - t0) / iters)
    fps_raw = NUM_I * B / dt_raw

    print(
        json.dumps(
            {
                "metric": "interp_frames_per_sec_720p_chip",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REF_A100_FPS_RANGE[1], 2),
                "vs_baseline_range": [
                    round(fps / REF_A100_FPS_RANGE[1], 2),
                    round(fps / REF_A100_FPS_RANGE[0], 2),
                ],
                "baseline_fps_estimate_range": list(REF_A100_FPS_RANGE),
                "fps_raw_incl_tunnel_sync": round(fps_raw, 2),
                "tunnel_sync_floor_ms": round(sync_floor * 1e3, 2),
                "ms_per_frame_device": round(dt / (NUM_I * B) * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
