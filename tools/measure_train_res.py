"""Measure the maximum trainable resolution with FastVariants on (VERDICT
round-2 #5): the fused mod_fac forward keeps the K^2*C kernel bank in VMEM,
but its custom VJP recomputes through the XLA twin, which materializes the
bank (B, H/2, W/2, K*K*C) in HBM during the backward — at 720p that is
~0.74 GB bf16 per sample for the bank plus its cotangent.

This sweeps training crop sizes at B=1 and B=4 (bf16 compute, f32 params,
Lap+census loss — the shipped recipe) and reports step time or OOM, so the
fast_mod training envelope is documented by measurement, not guesswork.

    python tools/measure_train_res.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.losses import laplacian_loss, census_loss
    from ebfi_tpu.utils.precision import to_bf16

    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True,
    )
    rng = np.random.default_rng(0)

    def make_step(B, H, W):
        frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        event = jnp.asarray(rng.standard_normal((B, H, W, 32)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
        params = model.init(jax.random.key(0), frame[:, :64, :64],
                            event[:, :64, :64], t)

        def loss_fn(p):
            cp = to_bf16(p)
            sharp, final = model.apply(
                cp, frame.astype(jnp.bfloat16), event.astype(jnp.bfloat16), t
            )
            final = final.astype(jnp.float32)
            return laplacian_loss(final, frame) + census_loss(final, frame)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        return params, grad_fn

    for B, H, W in ((1, 256, 256), (1, 512, 512), (1, 720, 1280),
                    (2, 720, 1280), (4, 512, 512), (8, 256, 256)):
        try:
            params, grad_fn = make_step(B, H, W)
            loss, grads = grad_fn(params)
            float(loss)  # sync through the tunnel
            t0 = time.perf_counter()
            for _ in range(3):
                loss, grads = grad_fn(params)
                float(loss)
            dt = (time.perf_counter() - t0) / 3
            gnorm = float(
                jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree.leaves(grads)))
            )
            print(f"B={B} {H}x{W}: {dt*1e3:8.1f} ms/step, |g|={gnorm:.3e}  OK")
        except Exception as e:  # noqa: BLE001 — OOM reporting sweep
            msg = str(e).splitlines()[0][:120]
            print(f"B={B} {H}x{W}: FAILED — {msg}")


if __name__ == "__main__":
    main()
