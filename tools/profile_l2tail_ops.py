"""Sub-op microbench of the l2 tail (dec4+fuse+head) at production shapes.

The l2 tail runs at ~60 TF/s on 0.0886 TFLOP/f (profile_detail_packed);
its conv/matmul FLOPs at plausible MXU rates only explain ~half the
measured 1.46 ms/frame — this tool times each constituent op in isolation
(scan-looped in one jit, one sync) to split compute from HBM traffic:

    dec4 conv2x2 (128->512)  | fuse dense kron vs grouped | SE pool+gate
    reflect-pad materialization | head 3x3 block conv (256->48)

    python tools/profile_l2tail_ops.py [--chunk 16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLOOR = [0.0]


def timed_scan(fn, *args, reps=10):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(*xs):
        def body(c, _):
            pert = lambda a: a + (c * 1e-30).astype(a.dtype)
            out = fn(*jax.tree.map(pert, xs))
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models.unet3d import _head_weight_l2, _reflect_pad_blocks4
    from ebfi_tpu.ops.s2d import conv2x2_valid

    CH = args.chunk
    C = 16
    hb, wb = 181, 321  # shifted quarter grid of 720p
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    _FLOOR[0] = (time.perf_counter() - t0) / 10
    print(f"sync floor {_FLOOR[0]*1e3:.1f} ms, chunk={CH}", flush=True)

    def report(name, fn, *xs):
        jfn = jax.jit(fn)
        comp = jfn.lower(*xs).compile()
        fl = float(comp.cost_analysis().get("flops", float("nan")))
        t = timed_scan(fn, *xs)
        print(f"{name:34s}: {t*1e3:7.2f} ms = {t/CH*1e3:5.2f} ms/f "
              f"| {fl/CH/1e12:7.4f} TFLOP/f | {fl/max(t,1e-9)/1e12:6.1f} TF/s",
              flush=True)
        return jfn(*xs)

    # dec4 stage input: shifted quarter-packed concat parts (128 + 128)
    d0a = jnp.asarray(rng.standard_normal((CH, hb, wb, 128)), bf)
    x0s = jnp.asarray(rng.standard_normal((CH, hb, wb, 128)), bf)
    w44 = jnp.asarray(rng.standard_normal((2, 2, 256, 512)) * 0.05, bf)
    report("dec4 conv2x2 256->512 (concat)",
           lambda a, b, w: conv2x2_valid(jnp.concatenate([a, b], -1), w),
           d0a, x0s, w44)
    report("dec4 as two part-convs",
           lambda a, b, w: conv2x2_valid(a, w[:, :, :128]) +
                           conv2x2_valid(b, w[:, :, 128:]),
           d0a, x0s, w44)

    y = jnp.asarray(rng.standard_normal((CH, hb - 1, wb - 1, 512)), bf)
    gate = jnp.asarray(rng.uniform(0.3, 0.9, (CH, 512)), bf)

    report("SE pool (mean over HW)", lambda t: jnp.mean(t, axis=(1, 2)), y)
    report("gate mul + lrelu (1 pass)",
           lambda t, g: nn.leaky_relu(t * g[:, None, None, :], 0.2), y, gate)

    fk = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, bf)

    def fuse_dense(t, f):
        wblk = jnp.kron(jnp.eye(16, dtype=bf), f)
        return t @ wblk

    def fuse_grouped(t, f):
        wg = jnp.tile(f, (1, 16))[None, None]
        return lax.conv_general_dilated(
            t, wg, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )

    report("fuse dense kron 512x256", fuse_dense, y, fk)
    report("fuse grouped fgc=16", fuse_grouped, y, fk)
    report("fuse grouped + gate + lrelu",
           lambda t, g, f: fuse_grouped(nn.leaky_relu(t * g[:, None, None, :], 0.2), f),
           y, gate, fk)

    fused = jnp.asarray(rng.standard_normal((CH, hb - 1, wb - 1, 256)), bf)
    report("reflect-pad blocks4 (materialize)",
           lambda t: _reflect_pad_blocks4(t, C), fused)

    # the head consumes the fuse output: C=16 per phase group -> the l2
    # weight is (3, 3, 16*16=256, 48)
    w7 = jnp.asarray(rng.standard_normal((7, 7, C, 3)) * 0.05, bf)

    def head(t, w):
        w4 = _head_weight_l2(w)
        sp = _reflect_pad_blocks4(t, C)
        return lax.conv_general_dilated(
            sp, w4, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def head_nopad(t, w):
        w4 = _head_weight_l2(w)
        return lax.conv_general_dilated(
            t, w4, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    report("head 3x3 256->48 (reflect pad)", head, fused, w7)
    report("head 3x3 256->48 (zero pad)", head_nopad, fused, w7)


if __name__ == "__main__":
    main()
