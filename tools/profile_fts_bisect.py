"""In-graph bisection of the DETAIL branch inside the production tail.

profile_prefix --hoist --scan shows detail at 5.57 ms/frame in-graph
(fts - fts_nod) while profile_detail_packed --scan measures the identical
packed pipeline at 3.16 ms/frame standalone.  This tool localizes the
in-graph tax: it rebuilds from_timestamp_shared EXACTLY (rc tail -> mod
tail -> recon_s2d packed) and then truncates the detail branch at
successive stage frontiers, all inside one jit, scan-timed.  Stage deltas
between prefixes are the true in-graph stage costs including whatever
layout/fusion decisions the surrounding graph forces.

    python tools/profile_fts_bisect.py [--chunk 16] [--only nod,stem,...]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLOOR = [0.0]


def measure_sync_floor():
    import jax.numpy as jnp

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        float((z + 0).ravel()[0])
    _FLOOR[0] = (time.perf_counter() - t0) / n
    return _FLOOR[0]


def timed_scan(fn, tr, h, t_, reps=8):
    """REPS serial body evaluations in ONE program; one sync; floor
    subtracted once (see profile_prefix.timed_scan for the rationale)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(tr_, h_, tc_):
        def body(c, _):
            out = fn(tr_, h_, tc_ + (c * 1e-30).astype(tc_.dtype))
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
            return (s * 1e-30 + c * 0.5), None

        return lax.scan(body, jnp.float32(0.0), None, length=reps)[0]

    float(run(tr, h, t_))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(tr, h, t_))
        best = min(best, time.perf_counter() - t0)
    return max(best - _FLOOR[0], 0.0) / reps, run


class _Fake:
    def __init__(self, subtree):
        self.variables = {"params": subtree}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--size", type=str, default="720x1280",
                    help="HxW (use e.g. 64x64 for a CPU smoke run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.models.unet3d import (
        UNet3d18,
        _BasicBlock3D,
        _ConvSE,
        _Encoder3D,
        _stem_weight_l2,
    )
    from ebfi_tpu.ops.s2d import (
        depth_to_space,
        recon_s2d,
        shift_packed,
        shifted_to_standard,
        space_to_depth,
    )
    from ebfi_tpu.utils.precision import to_bf16

    CH = args.chunk
    CHANNELS = (16, 24, 32, 64)
    c0, c1, c2, c3 = CHANNELS
    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=True, channels=CHANNELS,
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True,
    )
    rng = np.random.default_rng(0)
    B, TB = 1, 16
    H, W = (int(v) for v in args.size.split("x"))
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    ts = jnp.asarray(np.full((B, 1), 0.3, np.float32))
    params = model.init(jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts)
    cp = to_bf16(params)
    P = cp["params"]["detail"]

    floor = measure_sync_floor()
    print(f"sync floor: {floor*1e3:.2f} ms, chunk={CH}", flush=True)

    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    frame1, event1 = cast((frame, jnp.abs(event)))
    trunk = jax.jit(
        lambda f, e: model.apply(cp, f, e, None, method=EVFIAutoEx.features)
    )(frame1, event1)
    hoisted = jax.jit(lambda tr: model.apply(cp, tr, method=EVFIAutoEx.hoist))(trunk)
    tcol = cast(jnp.asarray(np.linspace(0.05, 0.95, CH, dtype=np.float32))[:, None])

    def rmr(m, tr, h, t_):
        """rc tail -> mod tail -> recon packed: from_timestamp_shared's
        prefix before the detail branch, verbatim."""
        frame_feat, event_feat, ex, frame_ = tr
        ev = m.residual_control(None, None, t_, mode="tail", hoisted=h["rc"])
        fr = m.modification(frame_feat, ev, mode="tail", hoisted=h["mod"])
        cv = lambda mm: mm.variables["params"]["Conv_0"]
        return recon_s2d(
            fr,
            cv(m.recon_up)["kernel"], cv(m.recon_up)["bias"],
            cv(m.recon_mid)["kernel"], cv(m.recon_mid)["bias"],
            cv(m.recon_out)["kernel"], cv(m.recon_out)["bias"],
            return_packed=True,
        )

    enc = _Encoder3D(CHANNELS, fast=True)
    lrelu = lambda v: nn.leaky_relu(v, 0.2)
    blk = lambda name, planes, stride=(1, 1), down=False: (
        lambda x: _BasicBlock3D(planes, stride, downsample=down).apply(
            {"params": P["encoder"][name]}, x
        )
    )
    up = lambda name, parts, cout, **kw: UNet3d18._upconv_fast(
        UNet3d18, _Fake(P[name]), parts, cout, **kw
    )

    def stages(which):
        def run(tr, h, t_):
            sharp_pk = model.apply(cp, tr, h, t_, method=rmr)
            sharp = depth_to_space(sharp_pk)
            if which == "nod":
                return (sharp,)
            stem_pre = h["stem"]
            wsh = _stem_weight_l2(P["encoder"]["stem"]["kernel"], 1, sharp_pk.dtype)
            sp = jnp.pad(space_to_depth(sharp_pk), ((0, 0), (1, 1), (1, 1), (0, 0)))
            x0_pk = nn.relu(stem_pre + lax.conv_general_dilated(
                sp, wsh, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
            if which == "stem":
                return sharp, x0_pk
            hb, wb = x0_pk.shape[1], x0_pk.shape[2]
            xs = _Encoder3D._layer1_blocks_shifted(
                enc, shift_packed(x0_pk),
                (_Fake(P["encoder"]["layer1_0"]), _Fake(P["encoder"]["layer1_1"])),
                c0, 2 * hb, 2 * wb,
            )
            x1_pk = shifted_to_standard(xs)
            if which == "l1":
                return sharp, x0_pk, x1_pk
            x2 = _Encoder3D._layer2_0_packed(
                enc, x1_pk, _Fake(P["encoder"]["layer2_0"]), c1
            )
            x2 = blk("layer2_1", c1)(x2)
            if which == "l2":
                return sharp, x0_pk, x1_pk, x2
            x3 = blk("layer3_1", c2)(blk("layer3_0", c2, (2, 2), True)(x2))
            x4 = blk("layer4_1", c3)(blk("layer4_0", c3, (1, 1), True)(x3))
            if which == "l34":
                return sharp, x0_pk, x1_pk, x2, x4
            d3a = lrelu(_ConvSE(c2).apply({"params": P["dec0"]}, x4))
            d2a = lrelu(up("dec1", (d3a, x3), c1))
            if which == "dec01":
                return sharp, x0_pk, x1_pk, x2, d2a
            dec2_pk = lrelu(up("dec2", (d2a, x2), c0, packed_out=True))
            d0a_sh = lrelu(UNet3d18._convse_fast_packed(
                UNet3d18, _Fake(P["dec3"]), (dec2_pk, x1_pk), c0
            ))
            if which == "dec23":
                return sharp, x0_pk, d0a_sh
            det_pk = UNet3d18._s2d_tail_l2(
                UNet3d18, (d0a_sh, shift_packed(x0_pk)), _Fake(P["dec4"]),
                _Fake(P["feature_fuse"]), _Fake(P["outconv"]), c0,
                packed_out=True, pre_shifted=True,
            )
            if which == "tail":
                return sharp, det_pk
            return (depth_to_space(sharp_pk + det_pk),)

        return run

    # sanity: the "full" body must reproduce from_timestamp_shared's final
    ref_final = jax.jit(
        lambda tr, h, t_: model.apply(
            cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared
        )[1]
    )(trunk, hoisted, tcol)
    got_final = jax.jit(stages("full"))(trunk, hoisted, tcol)[0]
    err = float(jnp.max(jnp.abs(ref_final.astype(jnp.float32)
                                - got_final.astype(jnp.float32))))
    print(f"full-body parity vs from_timestamp_shared: max|diff| = {err:.3e}",
          flush=True)
    assert err < 1e-2, "bisect body diverged from the production path"

    names = ("nod", "stem", "l1", "l2", "l34", "dec01", "dec23", "tail", "full")
    if args.only:
        names = tuple(n for n in names if n in args.only.split(","))
    results = {}
    prev = None
    for which in names:
        t, _ = timed_scan(stages(which), trunk, hoisted, tcol)
        results[which] = t
        d = (t - prev) / CH * 1e3 if prev is not None else float("nan")
        print(f"prefix {which:6s}: {t*1e3:8.2f} ms = {t/CH*1e3:6.2f} ms/frame "
              f"| delta {d:+6.2f} ms/frame", flush=True)
        prev = t


if __name__ == "__main__":
    main()
