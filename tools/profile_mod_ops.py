"""Sub-op microbench of the Modification stage at production shapes.

The engine-level prefix scan (profile_prefix --hoist --scan) shows the mod
stage at 4.45 ms/frame while its constituents' known ceilings sum to ~3.0
(shared Pallas kernel ~173 TF/s standalone, conv1/conv3/conv2 at rows2
lanes).  This times each piece in isolation, scan-looped:

    conv1 1x1 (ev featization) | shared fused kernel (packed out) |
    rows2 conv3+conv2 tail + gated residual | whole mod tail

    python tools/profile_mod_ops.py [--chunk 16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLOOR = [0.0]


def timed_scan(fn, *args, reps=8):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(*xs):
        def body(c, _):
            pert = lambda a: a + (c * 1e-30).astype(a.dtype)
            out = fn(*jax.tree.map(pert, xs))
            # FULL reduction: an element-slice carry lets XLA narrow the
            # body's convs to a one-pixel window (measured >8x-peak
            # artifact rates)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
            return (s * 1e-30 + c * 0.5), None

        return lax.scan(body, jnp.float32(0.0), None, length=reps)[0]

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _FLOOR[0], 0.0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models.modification import Modification
    from ebfi_tpu.ops.pallas.mod_fac import modification_fac_fused_shared_packed

    CH = args.chunk
    C, K = 64, 5
    H, W = 360, 640
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    _FLOOR[0] = (time.perf_counter() - t0) / 10
    print(f"sync floor {_FLOOR[0]*1e3:.1f} ms, chunk={CH}", flush=True)

    def report(name, fn, *xs, tflop_f=None):
        jfn = jax.jit(fn)
        if args.only and not any(s in name for s in args.only.split(",")):
            return jfn(*xs)  # downstream stages still need the value
        comp = jfn.lower(*xs).compile()
        fl = float(comp.cost_analysis().get("flops", float("nan")))
        t = timed_scan(fn, *xs)
        known = f" | true {tflop_f:6.4f} TFLOP/f -> {tflop_f*CH/max(t,1e-9)/1:6.1f} TF/s" if tflop_f else ""
        print(f"{name:30s}: {t*1e3:7.2f} ms = {t/CH*1e3:5.2f} ms/f "
              f"| xla {fl/CH/1e12:7.4f} TFLOP/f{known}",
              flush=True)
        return jfn(*xs)

    mod = Modification(frame_basech=C, fused=True)
    ev_feat = jnp.asarray(rng.standard_normal((CH, H, W, C)), bf)
    ff = jnp.asarray(rng.standard_normal((1, H, W, C)), bf)
    params = jax.tree.map(
        lambda x: x.astype(bf), mod.init(jax.random.key(0), ff, ff)
    )
    P = params["params"]
    wk = P["kernel_conv"]["Conv_0"]["kernel"]
    bk = P["kernel_conv"]["Conv_0"]["bias"]
    w1 = P["conv1"]["Conv_0"]["kernel"]
    b1 = P["conv1"]["Conv_0"]["bias"]

    # conv1: 1x1 C->C on the event features at batch CH
    conv1 = lambda e: nn.leaky_relu(
        lax.conv_general_dilated(
            e, w1, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1, 0.01)
    ev = report("conv1 1x1 (ev)", conv1, ev_feat,
                tflop_f=H * W * C * C * 2 / 1e12)

    # the shared fused kernel, packed rows2 output (production form)
    kfl = (H * W * 9 * C * (K * K * C) * 2 / 16 / 1e12  # ff half amortized
           + H * W * 9 * C * (K * K * C) * 2 / 1e12     # ev half
           + H * W * K * K * C * 2 / 1e12)              # FAC apply
    e1p = report(
        "fused kernel (packed out)",
        lambda e, f: modification_fac_fused_shared_packed(e, f, wk, bk, K),
        ev, ff, tflop_f=kfl,
    )

    # whole mod tail via the module (conv1 + kernel + rows2 conv3/conv2 +
    # gated residual); conv3/conv2+residual cost = module - conv1 - kernel
    report("mod tail (module, hoisted)",
           lambda f_, e_: mod.apply(params, f_, e_, mode="tail", hoisted={}),
           ff, ev_feat,
           tflop_f=kfl + H * W * C * C * 2 / 1e12
           + 2 * H * W * 9 * C * C * 2 * (4 / 3) / 1e12)


if __name__ == "__main__":
    main()
