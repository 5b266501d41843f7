"""FLOP accounting for the train step from XLA's cost model (CPU lowering —
the HLO math is platform-independent; Pallas fast paths fall back to their
XLA twins on CPU, which compute the same FLOPs).

    python tools/train_flops.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.losses import laplacian_loss, census_loss
    from ebfi_tpu.utils.precision import to_bf16

    def flagship(**over):
        kw = dict(
            frame_basech=64, event_basech=64, inter_ch=64, tb=16,
            blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
            residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
            fast_recon=True, fast_detail=True, fast_mod=True,
            fast_control=True,
        )
        kw.update(over)
        return EVFIAutoEx(**kw)

    rng = np.random.default_rng(0)

    def tflops(model, B, H, W, grad=True, loss_kind="lap_census"):
        frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        event = jnp.asarray(rng.standard_normal((B, H, W, 32)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
        target = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        params = jax.eval_shape(
            lambda: model.init(jax.random.key(0), frame[:, :64, :64],
                               event[:, :64, :64], t)
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

        def loss_fn(p, fr):
            cp = to_bf16(p)
            sharp, final = model.apply(
                cp, fr.astype(jnp.bfloat16), event.astype(jnp.bfloat16), t
            )
            final = final.astype(jnp.float32)
            sharp = sharp.astype(jnp.float32)
            if loss_kind == "lap_census":
                return (laplacian_loss(final, target) + census_loss(final, target)
                        ) * 0.1 + (laplacian_loss(sharp, target)
                                   + census_loss(sharp, target))
            return jnp.mean(jnp.abs(final - target))

        def one(fr):
            if grad:
                loss, grads = jax.value_and_grad(loss_fn)(params, fr)
                s = sum(jnp.sum(g.astype(jnp.float32))
                        for g in jax.tree.leaves(grads))
                return loss + 0.0 * s
            return loss_fn(params, fr)

        lowered = jax.jit(one).lower(frame)
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) / 1e12

    for label, kw, shape in [
        ("fwd+bwd recipe", dict(), (8, 128, 128)),
        ("fwd only recipe", dict(grad=False), (8, 128, 128)),
        ("fwd+bwd L1", dict(loss_kind="l1"), (8, 128, 128)),
        ("fwd+bwd 720p B=1", dict(), (1, 720, 1280)),
        ("fwd+bwd 256 B=8", dict(), (8, 256, 256)),
        ("fwd+bwd 512 B=1", dict(), (1, 512, 512)),
        ("fwd+bwd 256 B=1", dict(), (1, 256, 256)),
    ]:
        B, H, W = shape
        print(f"{label:22s} B={B} {H}x{W}: "
              f"{tflops(flagship(), B, H, W, **kw):7.3f} TFLOP", flush=True)


if __name__ == "__main__":
    main()
