"""Stage-by-stage profile of the detail branch (UNet3d18) at 720p.

    python tools/profile_detail.py [--chunk 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SYNC_FLOOR = [0.0]


def measure_sync_floor():
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
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
    return max((time.perf_counter() - t0) / iters - _SYNC_FLOOR[0], 0.0)


class _Fake:
    """Duck-typed bound module: exposes .variables for the *_fast helpers."""

    def __init__(self, subtree):
        self.variables = {"params": subtree}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models.unet3d import UNet3d18, _Encoder3D

    CH = args.chunk
    model = UNet3d18(channels=(16, 24, 32, 64), fast_tail=True)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (CH, 720, 1280, 3)), jnp.bfloat16)
    img1 = jnp.asarray(rng.uniform(0, 1, (CH, 720, 1280, 3)), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        model.init(jax.random.key(0), img0[:1, :64, :64], img1[:1, :64, :64]),
    )
    P = params["params"]

    floor = measure_sync_floor()
    print(f"sync floor: {floor*1e3:.2f} ms, chunk={CH}")

    def report(name, fn, *xs):
        jfn = jax.jit(fn)
        comp = jfn.lower(*xs).compile()
        fl = float(comp.cost_analysis().get("flops", float("nan")))
        t = timed(jfn, *xs)
        print(f"{name:26s}: {t*1e3:8.2f} ms = {t/CH*1e3:6.2f} ms/frame "
              f"| {fl/CH/1e12:7.4f} TFLOP/f | {fl/max(t,1e-9)/1e12:6.1f} TF/s")
        return jfn(*xs)

    lrelu = lambda v: nn.leaky_relu(v, 0.2)

    report("FULL detail", lambda a, b: model.apply(params, a, b), img0, img1)

    enc = _Encoder3D((16, 24, 32, 64), fast=True)
    encp = {"params": P["encoder"]}
    enc_out = report(
        "encoder (stem+L1-4)",
        lambda a, b: enc.apply(encp, jnp.concatenate([a, b], axis=-1)),
        img0, img1,
    )
    x0, x1, x2, x3, x4 = enc_out

    # encoder internals: stem, layer1 (s2d), layers2-4
    from ebfi_tpu.models.unet3d import _BasicBlock3D, _stem_weight_s2d
    from ebfi_tpu.ops.s2d import conv7s2_s2d, space_to_depth

    def stem_only(a, b):
        w4 = _stem_weight_s2d(P["encoder"]["stem"]["kernel"], a.dtype)
        perm = np.concatenate(
            [np.arange(4)[:, None] * 6 + np.arange(3),
             np.arange(4)[:, None] * 6 + 3 + np.arange(3)]
        ).reshape(-1)
        f_pk = space_to_depth(a)
        s_pk = space_to_depth(b)
        return nn.relu(conv7s2_s2d(
            jnp.concatenate([f_pk, s_pk], axis=-1), w4[:, :, perm, :]))

    from ebfi_tpu.models.unet3d import _Encoder3D as _Enc

    def l1_fast(x0_):
        return _Enc._layer1_s2d(
            enc, x0_, (_Fake(P["encoder"]["layer1_0"]), _Fake(P["encoder"]["layer1_1"])), 16
        )

    def block(name, planes, stride=(1, 1), down=False):
        mod = _BasicBlock3D(planes, stride, downsample=down)
        return lambda x: mod.apply({"params": P["encoder"][name]}, x)

    def l24(x1_):
        h = block("layer2_0", 24, (2, 2), True)(x1_)
        h = block("layer2_1", 24)(h)
        h = block("layer3_0", 32, (2, 2), True)(h)
        h = block("layer3_1", 32)(h)
        h = block("layer4_0", 64, (1, 1), True)(h)
        return block("layer4_1", 64)(h)

    x0_ = report("  stem (s2d)", stem_only, img0, img1)
    x1_ = report("  layer1 (s2d)", l1_fast, x0_)
    report("  layers2-4", l24, x1_)

    from ebfi_tpu.models.unet3d import _ConvSE

    dec0_mod = _ConvSE(32)
    up = lambda name, parts, cout: UNet3d18._upconv_fast(
        UNet3d18, _Fake(P[name]), parts, cout
    )
    cse = lambda name, parts, cout: UNet3d18._convse_fast(
        UNet3d18, _Fake(P[name]), parts, cout
    )
    tail = lambda parts: UNet3d18._s2d_tail(
        UNet3d18, parts, _Fake(P["dec4"]), _Fake(P["feature_fuse"]),
        _Fake(P["outconv"]), 16,
    )

    d3a = report(
        "  dec0 (1/16 res)",
        lambda x4_: lrelu(dec0_mod.apply({"params": P["dec0"]}, x4_)),
        x4,
    )
    d2a = report("  dec1 up (->1/8)", lambda a, b: lrelu(up("dec1", (a, b), 24)), d3a, x3)
    d1a = report("  dec2 up (->1/4)", lambda a, b: lrelu(up("dec2", (a, b), 16)), d2a, x2)
    d0a = report("  dec3 conv (1/2)", lambda a, b: lrelu(cse("dec3", (a, b), 16)), d1a, x1)
    report("  s2d tail (dec4+head)", lambda a, b: tail((a, b)), d0a, x0)

    # whole decoder+tail in one jit (captures inter-stage glue)
    def dectail(x0_, x1_, x2_, x3_, x4_):
        d3 = (lrelu(dec0_mod.apply({"params": P["dec0"]}, x4_)), x3_)
        d2 = (lrelu(up("dec1", d3, 24)), x2_)
        d1 = (lrelu(up("dec2", d2, 16)), x1_)
        d0 = (lrelu(cse("dec3", d1, 16)), x0_)
        return tail(d0)

    report("decoder+tail one-jit", dectail, x0, x1, x2, x3, x4)


if __name__ == "__main__":
    main()
