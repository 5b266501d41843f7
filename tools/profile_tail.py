"""Per-component timing of the EVFIAutoEx forward at 720p on device.

Measures trunk, residual_control, modification (FAC), reconstruction, and
detail separately (each jitted standalone), plus the full engine.interpolate
path, to locate the per-output-frame hot spots.  Run on the real TPU:

    python tools/profile_tail.py [--chunk 8] [--steps 12]
"""
import argparse
import time

import numpy as np


_SYNC_FLOOR = [0.0]


def measure_sync_floor():
    """The axon tunnel adds ~26-50 ms per host read; measure and subtract."""
    import jax.numpy as jnp

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        float((z + 0).ravel()[0])
    _SYNC_FLOOR[0] = (time.perf_counter() - t0) / n
    return _SYNC_FLOOR[0]


def timed(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        # axon tunnel: force a device_get sync
        float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # ONE sync per iteration; its cost is subtracted via the floor
        float(jax.tree.leaves(out)[0].ravel()[0])
    return max((time.perf_counter() - t0) / iters - _SYNC_FLOOR[0], 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--fast", action="store_true",
                    help="profile the fast execution variants (what the "
                         "bf16 engine actually runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.utils.precision import to_bf16

    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=args.steps, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
    )
    if args.fast:
        model = model.clone(fast_recon=True, fast_detail=True,
                            fast_mod=True, fast_control=True)
    rng = np.random.default_rng(0)
    B, H, W, TB = 1, 720, 1280, 16
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(np.abs(rng.standard_normal((B, H, W, 2 * TB))).astype(np.float32))
    ts = jnp.asarray(np.full((B, 1), 0.3, np.float32))
    params = model.init(jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts)

    floor = measure_sync_floor()
    print(f"sync floor: {floor*1e3:.2f} ms (subtracted from every timing)")
    cp = to_bf16(params) if args.precision == "bf16" else params
    cast = (lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)) if args.precision == "bf16" else (lambda t: t)
    CH = args.chunk

    print(f"chunk={CH} steps={args.steps} precision={args.precision}")
    # trunk once at B=1 (padded 720p -> 720x1280 already /8-able)
    trunk_fn = jax.jit(lambda f, e: model.apply(cp, f, e, None, method=EVFIAutoEx.features))
    frame_b, event_b = cast((frame, event))
    t_trunk = timed(trunk_fn, frame_b, event_b)
    print(f"trunk (B=1):            {t_trunk*1e3:8.2f} ms")
    trunk = trunk_fn(frame_b, event_b)
    frame_feat, event_feat, ex, frame_p = trunk

    # tail parts at batch=chunk (the engine folds timestamps into batch)
    rep = lambda x: jnp.repeat(x, CH, axis=0)
    ff, ef, exr, fp = rep(frame_feat), rep(event_feat), rep(ex), rep(frame_p)
    tcol = jnp.full((CH, 1), 0.3, ff.dtype)

    rc_fn = jax.jit(lambda e, x, t: model.apply(cp, e, x, t, method=lambda m, e_, x_, t_: m.residual_control(e_, x_, t_)))
    t_rc = timed(rc_fn, ef, exr, tcol)
    pev = rc_fn(ef, exr, tcol)
    print(f"residual_control (B={CH}): {t_rc*1e3:8.2f} ms = {t_rc/CH*1e3:6.2f} ms/frame")

    mod_fn = jax.jit(lambda f, e: model.apply(cp, f, e, method=lambda m, f_, e_: m.modification(f_, e_)))
    t_mod = timed(mod_fn, ff, pev)
    pfr = mod_fn(ff, pev)
    print(f"modification/FAC (B={CH}): {t_mod*1e3:8.2f} ms = {t_mod/CH*1e3:6.2f} ms/frame")

    # hoisted variants (what the engine's B=1 batched path runs)
    rc_h = jax.jit(lambda e, x: model.apply(
        cp, e, x, None, mode="hoist",
        method=lambda m, e_, x_, t_, mode: m.residual_control(e_, x_, t_, mode=mode)))
    hoisted_rc = rc_h(event_feat, ex)
    rc_tail = jax.jit(lambda h, t: model.apply(
        cp, None, None, t, mode="tail", hoisted=h,
        method=lambda m, e_, x_, t_, mode, hoisted: m.residual_control(
            e_, x_, t_, mode=mode, hoisted=hoisted)))
    t_rct = timed(rc_tail, hoisted_rc, tcol)
    print(f"RC hoisted tail (B={CH}):  {t_rct*1e3:8.2f} ms = {t_rct/CH*1e3:6.2f} ms/frame")

    mod_h = jax.jit(lambda f: model.apply(
        cp, f, None, mode="hoist",
        method=lambda m, f_, e_, mode: m.modification(f_, e_, mode=mode)))
    hoisted_mod = mod_h(frame_feat)
    mod_tail = jax.jit(lambda f, e, h: model.apply(
        cp, f, e, mode="tail", hoisted=h,
        method=lambda m, f_, e_, mode, hoisted: m.modification(
            f_, e_, mode=mode, hoisted=hoisted)))
    t_modt = timed(mod_tail, frame_feat, pev, hoisted_mod)
    print(f"mod hoisted tail (B={CH}): {t_modt*1e3:8.2f} ms = {t_modt/CH*1e3:6.2f} ms/frame")

    def recon(m, x):
        from ebfi_tpu.ops import pixel_shuffle
        import flax.linen as nn
        up = pixel_shuffle(m.recon_up(x), 2)
        up = nn.leaky_relu(up, 0.01)
        return m.recon_out(m.recon_mid(up))
    recon_fn = jax.jit(lambda x: model.apply(cp, x, method=recon))
    t_recon = timed(recon_fn, pfr)
    sharp = recon_fn(pfr)
    print(f"reconstruction (B={CH}):   {t_recon*1e3:8.2f} ms = {t_recon/CH*1e3:6.2f} ms/frame")

    det_fn = jax.jit(lambda f, s: model.apply(cp, f, s, method=lambda m, f_, s_: m.detail(f_, s_)))
    t_det = timed(det_fn, fp, sharp)
    print(f"detail UNet3d (B={CH}):    {t_det*1e3:8.2f} ms = {t_det/CH*1e3:6.2f} ms/frame")

    # the tail as ONE jit (what the engine actually scans) — the gap
    # between this and the sum of the pieces is inter-stage glue
    tail_fn = jax.jit(lambda ff_, ef_, ex_, fp_, t_: model.apply(
        cp, ff_, ef_, ex_, fp_, t_, method=EVFIAutoEx.from_timestamp))
    t_tail = timed(tail_fn, ff, ef, exr, fp, tcol)
    print(f"full tail one-jit (B={CH}): {t_tail*1e3:8.2f} ms = {t_tail/CH*1e3:6.2f} ms/frame")

    # hoisted full tail (trunk at B=1)
    hoist_fn = jax.jit(lambda tr: model.apply(cp, tr, method=EVFIAutoEx.hoist))
    hoisted_all = hoist_fn(trunk)
    t_hoist = timed(hoist_fn, trunk)
    print(f"hoist (B=1, once/frame):  {t_hoist*1e3:8.2f} ms")
    tailh_fn = jax.jit(lambda tr, h, t_: model.apply(
        cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared))
    t_tailh = timed(tailh_fn, trunk, hoisted_all, tcol)
    print(f"hoisted tail one-jit (B={CH}): {t_tailh*1e3:8.2f} ms = {t_tailh/CH*1e3:6.2f} ms/frame")

    # detail-branch internals: stem+encoder vs decoder/tail
    from ebfi_tpu.models.unet3d import _Encoder3D
    enc_mod = _Encoder3D((16, 24, 32, 64), fast=args.fast)
    enc_params = {"params": cp["params"]["detail"]["encoder"]}
    enc_fn = jax.jit(lambda f, s: enc_mod.apply(
        enc_params, jnp.concatenate([f, s], axis=-1)))
    t_enc = timed(enc_fn, fp, sharp)
    print(f"  detail encoder only:     {t_enc*1e3:8.2f} ms = {t_enc/CH*1e3:6.2f} ms/frame")

    # stem timing via a standalone conv with the same shape
    import flax.linen as nn
    from jax import lax
    stem_w = jnp.zeros((7, 7, 6, 32), jnp.bfloat16 if args.precision == "bf16" else jnp.float32)
    stem_fn = jax.jit(lambda x: lax.conv_general_dilated(
        x, stem_w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    imgs = jnp.concatenate([fp, sharp], axis=-1)
    t_stem = timed(stem_fn, imgs)
    print(f"  detail stem conv (7x7/2): {t_stem*1e3:8.2f} ms = {t_stem/CH*1e3:6.2f} ms/frame")

    # full engine
    from ebfi_tpu.infer import InferenceEngine
    NUM_I = 16
    tsN = jnp.asarray(np.linspace(0, 1, NUM_I, dtype=np.float32)[None])
    eng = InferenceEngine(model, params, precision=args.precision, multi_chunk=CH)
    t_eng = timed(lambda: eng.interpolate(frame, event, tsN))
    fps = NUM_I / t_eng

    parts = t_trunk / NUM_I + (t_rc + t_mod + t_recon + t_det) / CH
    print(f"sum of parts per frame: {parts*1e3:8.2f} ms")
    print(f"engine.interpolate x{NUM_I}: {t_eng*1e3:8.2f} ms -> {fps:.2f} fps")


if __name__ == "__main__":
    main()
