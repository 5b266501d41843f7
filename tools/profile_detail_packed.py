"""Stage-by-stage profile of the PRODUCTION detail path at 720p.

profile_detail.py times the generic fast path (images in, stem not
hoisted).  This tool times the exact pipeline the hoisted engine runs
(models/evfi.py::from_timestamp_shared): stem hoisted to the l2 packing,
sharp arriving 2x2-packed from recon, packed layer1/layer2_0, packed
dec2/dec3, pre-shifted l2 tail, packed residual add.

    python tools/profile_detail_packed.py [--chunk 16]
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


def timed_scan(fn, *args, reps=10):
    """Pure device time: REPS serial evaluations inside ONE program (a
    lax.scan whose per-step inputs depend on the carry, so XLA can neither
    hoist nor parallelize the body), one host sync, floor-subtracted once.
    Immune to the tunnel's per-dispatch dead time that pollutes per-call
    timing of sub-ms stages."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    # inputs ride as jit ARGUMENTS, not closures — closed-over arrays embed
    # as HLO constants and blow the remote-compile tunnel's body limit
    @jax.jit
    def run(*xs):
        def body(c, _):
            # non-zero negligible coupling (advisor round-4: don't rely on
            # mul-by-zero not being folded)
            pert = lambda a: a + (c * 1e-30).astype(a.dtype)
            out = fn(*jax.tree.map(pert, xs))
            # FULL reduction carry: element slices let XLA narrow or DCE
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
            return (s * 1e-30 + c * 0.5), None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _SYNC_FLOOR[0], 0.0) / reps


class _Fake:
    """Duck-typed bound module: exposes .variables for the *_fast helpers."""

    def __init__(self, subtree):
        self.variables = {"params": subtree}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--scan", action="store_true",
                    help="time each stage as a REPS-loop inside one jit "
                         "(pure device time; slower to compile)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated stage-name substrings to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models.unet3d import (
        UNet3d18,
        _BasicBlock3D,
        _Encoder3D,
        _stem_weight_l2,
    )
    from ebfi_tpu.ops.s2d import shift_packed, space_to_depth

    CH = args.chunk
    CHANNELS = (16, 24, 32, 64)
    c0, c1, c2, c3 = CHANNELS
    model = UNet3d18(channels=CHANNELS, fast_tail=True)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, 720, 1280, 3)), jnp.bfloat16)
    sharp = jnp.asarray(rng.uniform(0, 1, (CH, 720, 1280, 3)), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        model.init(jax.random.key(0), img0[:, :64, :64], sharp[:1, :64, :64]),
    )
    P = params["params"]

    floor = measure_sync_floor()
    print(f"sync floor: {floor*1e3:.2f} ms, chunk={CH}", flush=True)

    # production inputs: stem_pre hoisted at B=1, sharp packed from recon
    stem_pre = jax.jit(
        lambda im: model.apply(params, im, im, mode="stem_hoist")
    )(img0)
    sharp_pk = jax.jit(space_to_depth)(sharp)
    print(f"stem_pre {stem_pre.shape}, sharp_pk {sharp_pk.shape}", flush=True)

    def report(name, fn, *xs):
        jfn = jax.jit(fn)
        if args.only and not any(s in name for s in args.only.split(",")):
            return jfn(*xs)
        comp = jfn.lower(*xs).compile()
        fl = float(comp.cost_analysis().get("flops", float("nan")))
        t = timed_scan(fn, *xs) if args.scan else timed(jfn, *xs)
        print(f"{name:28s}: {t*1e3:8.2f} ms = {t/CH*1e3:6.2f} ms/frame "
              f"| {fl/CH/1e12:7.4f} TFLOP/f | {fl/max(t,1e-9)/1e12:6.1f} TF/s",
              flush=True)
        return jfn(*xs)

    lrelu = lambda v: nn.leaky_relu(v, 0.2)

    # FULL production call (packed residual add included by the caller in
    # from_timestamp_shared; here we return the packed residual itself)
    report(
        "FULL detail (packed io)",
        lambda s_pk: model.apply(
            params, None, s_pk, stem_pre=stem_pre, packed_io=True
        ),
        sharp_pk,
    )

    # ---- encoder sub-stages (mirrors _packed_l2_path) ----
    enc = _Encoder3D(CHANNELS, fast=True)
    from jax import lax

    def stem_l2(s_pk):
        wsh = _stem_weight_l2(P["encoder"]["stem"]["kernel"], 1, s_pk.dtype)
        sp = jnp.pad(space_to_depth(s_pk), ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.relu(stem_pre + lax.conv_general_dilated(
            sp, wsh, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))

    x0_pk = report("  stem sharp-half (l2)", stem_l2, sharp_pk)
    hb, wb = x0_pk.shape[1], x0_pk.shape[2]

    def l1(x0_pk_):
        xs = _Encoder3D._layer1_blocks_shifted(
            enc, shift_packed(x0_pk_),
            (_Fake(P["encoder"]["layer1_0"]), _Fake(P["encoder"]["layer1_1"])),
            c0, 2 * hb, 2 * wb,
        )
        from ebfi_tpu.ops.s2d import shifted_to_standard

        return shifted_to_standard(xs)

    x1_pk = report("  layer1 (packed)", l1, x0_pk)

    def l20(x1_pk_):
        return _Encoder3D._layer2_0_packed(
            enc, x1_pk_, _Fake(P["encoder"]["layer2_0"]), c1
        )

    x2a = report("  layer2_0 (packed)", l20, x1_pk)

    def block(name, planes, stride=(1, 1), down=False):
        mod = _BasicBlock3D(planes, stride, downsample=down)
        return lambda x: mod.apply({"params": P["encoder"][name]}, x)

    x2 = report("  layer2_1", block("layer2_1", c1), x2a)

    def l3(x2_):
        h = block("layer3_0", c2, (2, 2), True)(x2_)
        return block("layer3_1", c2)(h)

    x3 = report("  layer3", l3, x2)

    def l4(x3_):
        h = block("layer4_0", c3, (1, 1), True)(x3_)
        return block("layer4_1", c3)(h)

    x4 = report("  layer4", l4, x3)

    # ---- decoder sub-stages (packed pipeline) ----
    from ebfi_tpu.models.unet3d import _ConvSE

    dec0_mod = _ConvSE(c2)
    up = lambda name, parts, cout, **kw: UNet3d18._upconv_fast(
        UNet3d18, _Fake(P[name]), parts, cout, **kw
    )
    csep = lambda name, parts, cout: UNet3d18._convse_fast_packed(
        UNet3d18, _Fake(P[name]), parts, cout
    )

    d3a = report(
        "  dec0 (1/16)",
        lambda x4_: lrelu(dec0_mod.apply({"params": P["dec0"]}, x4_)),
        x4,
    )
    d2a = report("  dec1 up (->1/8)",
                 lambda a, b: lrelu(up("dec1", (a, b), c1)), d3a, x3)
    d1a = report("  dec2 up packed (->1/4)",
                 lambda a, b: lrelu(up("dec2", (a, b), c0, packed_out=True)),
                 d2a, x2)
    d0a = report("  dec3 packed (shifted)",
                 lambda a, b: lrelu(csep("dec3", (a, b), c0)), d1a, x1_pk)

    def tail(d0a_, x0_pk_):
        return UNet3d18._s2d_tail_l2(
            UNet3d18, (d0a_, shift_packed(x0_pk_)), _Fake(P["dec4"]),
            _Fake(P["feature_fuse"]), _Fake(P["outconv"]), c0,
            packed_out=True, pre_shifted=True,
        )

    report("  l2 tail (dec4+fuse+head)", tail, d0a, x0_pk)

    # whole decoder in one jit (captures inter-stage glue)
    def dec_all(x0_pk_, x1_pk_, x2_, x3_, x4_):
        d3 = (lrelu(dec0_mod.apply({"params": P["dec0"]}, x4_)), x3_)
        d2 = (lrelu(up("dec1", d3, c1)), x2_)
        dec2_pk = lrelu(up("dec2", d2, c0, packed_out=True))
        d0a_sh = lrelu(csep("dec3", (dec2_pk, x1_pk_), c0))
        return UNet3d18._s2d_tail_l2(
            UNet3d18, (d0a_sh, shift_packed(x0_pk_)), _Fake(P["dec4"]),
            _Fake(P["feature_fuse"]), _Fake(P["outconv"]), c0,
            packed_out=True, pre_shifted=True,
        )

    report("decoder one-jit", dec_all, x0_pk, x1_pk, x2, x3, x4)

    def enc_all(s_pk):
        return _Encoder3D._packed_l2_path(
            enc.bind({"params": P["encoder"]}),
            None, stem_pre, s_pk,
        )

    try:
        report("encoder one-jit", enc_all, sharp_pk)
    except Exception as e:  # bind/stem module access may need the real path
        print(f"encoder one-jit: skipped ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
