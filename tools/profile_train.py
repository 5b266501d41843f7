"""Train-step profiling: step time + MFU at the reference training recipe.

The reference's real-world cost is dominated by training: 2e6 iterations at
B=8 with 128x128 random crops and the Lap+census loss
(/root/reference/config/train_ours.yml:18,90,131-134; train_ours.py:245-270).
This tool measures our jitted train step at that recipe shape (and the 720p
B=1 fine-tune shape), derives MFU from XLA's compiled cost model, and
attributes time across stages by toggling them off.

Methodology (see .claude/skills/verify): the axon tunnel adds a ~31-50 ms
sync floor per host read and queued dispatch does NOT pipeline, so each
measurement loops the step REPS times inside ONE jitted lax.scan whose
batch input depends on the carry (`frame + loss*0` — XLA does not fold
float mul by zero), syncing once at the end.

    python tools/profile_train.py [--reps 20] [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = {"v5e": 197.0}  # bf16 MXU peak per chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--quick", action="store_true", help="recipe shape only")
    ap.add_argument("--fast", default="1", help="FastVariants on/off (1/0)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.losses import laplacian_loss, census_loss
    from ebfi_tpu.utils.precision import to_bf16

    fast = args.fast == "1"

    def flagship(**over):
        kw = dict(
            frame_basech=64, event_basech=64, inter_ch=64, tb=16,
            blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
            residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
            fast_recon=fast, fast_detail=fast, fast_mod=fast,
            fast_control=fast,
        )
        kw.update(over)
        return EVFIAutoEx(**kw)

    rng = np.random.default_rng(0)

    def measure(model, B, H, W, reps, label, loss_kind="lap_census",
                grad=True):
        frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        event = jnp.asarray(rng.standard_normal((B, H, W, 32)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
        target = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        params = model.init(jax.random.key(0), frame[:, :64, :64],
                            event[:, :64, :64], t)

        def loss_fn(p, fr):
            cp = to_bf16(p)
            sharp, final = model.apply(
                cp, fr.astype(jnp.bfloat16), event.astype(jnp.bfloat16), t
            )
            final = final.astype(jnp.float32)
            sharp = sharp.astype(jnp.float32)
            if loss_kind == "lap_census":
                # phase-1 weights (train_ours.py:258-268)
                return (laplacian_loss(final, target) + census_loss(final, target)
                        ) * 0.1 + (laplacian_loss(sharp, target)
                                   + census_loss(sharp, target))
            return jnp.mean(jnp.abs(final - target))

        def one(fr):
            if grad:
                loss, grads = jax.value_and_grad(loss_fn)(params, fr)
                # fold grads into a scalar so the carry depends on ALL of bwd
                s = sum(jnp.sum(g.astype(jnp.float32))
                        for g in jax.tree.leaves(grads))
                return loss + 0.0 * s
            return loss_fn(params, fr)

        def scan_fn(n):
            def body(c, _):
                return one(frame * 0.0 + c * 0.0 + frame), None

            return lax.scan(body, jnp.float32(0.0), None, length=n)[0]

        # cost model from the single-step program
        compiled = jax.jit(one).lower(frame).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        tflop = float(ca.get("flops", 0.0)) / 1e12

        run1 = jax.jit(scan_fn, static_argnums=0)
        float(run1(2))  # compile + warm
        # sync floor: a trivial program, same sync path
        tiny = jax.jit(lambda x: x + 1.0)
        float(tiny(jnp.float32(0)))
        t0 = time.perf_counter()
        for _ in range(5):
            float(tiny(jnp.float32(0)))
        floor = (time.perf_counter() - t0) / 5

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run1(reps))
            dt = (time.perf_counter() - t0 - floor) / reps
            best = min(best, dt)
        tfs = tflop / best / 1.0
        mfu = tfs / PEAK_TFLOPS["v5e"] * 100 / 1e12 * 1e12
        print(f"{label:44s} B={B} {H}x{W}: {best*1e3:7.2f} ms/step  "
              f"{tflop:6.3f} TFLOP  {tflop/best:6.1f} TF/s  "
              f"MFU {tflop/best/PEAK_TFLOPS['v5e']*100:5.1f}%  "
              f"({B/best:6.1f} samples/s)", flush=True)
        return best, tflop

    R = args.reps
    # --- the reference recipe shape --------------------------------------
    measure(flagship(), 8, 128, 128, R, "flagship fwd+bwd (recipe)")
    if args.quick:
        return
    # stage attribution by ablation (differences ~ stage cost incl. bwd)
    measure(flagship(detail_enabled=False), 8, 128, 128, R, "  - detail off")
    measure(flagship(detail_enabled=False, step=1), 8, 128, 128, R,
            "  - detail off, RC step=1")
    measure(flagship(), 8, 128, 128, R, "  - L1 loss only", loss_kind="l1")
    measure(flagship(), 8, 128, 128, R, "  - forward only", grad=False)
    measure(flagship(use_gt_ex=True), 8, 128, 128, R, "  - gt_ex (no ExposureDecision)")
    # batch scaling: is B=8 latency-bound?
    for B in (16, 32):
        measure(flagship(), B, 128, 128, max(6, R // 2), "flagship fwd+bwd")
    # fine-tune shape
    measure(flagship(), 1, 720, 1280, max(4, R // 4), "flagship fwd+bwd (720p fine-tune)")


if __name__ == "__main__":
    main()
