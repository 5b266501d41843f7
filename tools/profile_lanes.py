"""Lane-padding cost of narrow-channel tensors at 720p production sizes.

The recon->detail interchange runs at 12 channels (2x2-packed RGB,
sharp_pk/det_pk): if XLA:TPU lays those out lane-padded (12 -> 128), every
elementwise pass moves ~10x the useful bytes.  Times elementwise add and
relayouts at C=12 vs C=48 vs C=128, plus memory_analysis of each program.

    python tools/profile_lanes.py
"""
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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.ops.s2d import depth_to_space, space_to_depth

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    CH = 16

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    _FLOOR[0] = (time.perf_counter() - t0) / 10
    print(f"sync floor {_FLOOR[0]*1e3:.1f} ms", flush=True)

    def report(name, fn, *xs):
        jfn = jax.jit(fn)
        comp = jfn.lower(*xs).compile()
        mem = comp.memory_analysis()
        t = timed_scan(fn, *xs)
        useful = sum(x.nbytes for x in xs) / 1e9
        print(f"{name:34s}: {t*1e3:7.2f} ms | useful in {useful:5.2f} GB "
              f"-> {useful/max(t,1e-9):5.0f} GB/s | temps "
              f"{getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f} GB",
              flush=True)

    shapes = [
        ("C=12 @ (16,360,640)", (CH, 360, 640, 12)),
        ("C=48 @ (16,180,320)", (CH, 180, 320, 48)),
        ("C=128 @ (16,360,640)", (CH, 360, 640, 128)),
    ]
    tensors = {
        n: (jnp.asarray(rng.standard_normal(s), bf),
            jnp.asarray(rng.standard_normal(s), bf))
        for n, s in shapes
    }
    for n, (a, b) in tensors.items():
        report(f"add {n}", lambda x, y: x + y, a, b)

    a12 = tensors["C=12 @ (16,360,640)"][0]
    report("space_to_depth 12->48", space_to_depth, a12)
    a48 = tensors["C=48 @ (16,180,320)"][0]
    report("depth_to_space 48->12", depth_to_space, a48)
    report("dts(dts(x)) 48->3 full res",
           lambda x: depth_to_space(depth_to_space(x)), a48)
    report("add48 + dts dts",
           lambda x, y: depth_to_space(depth_to_space(x + y)),
           a48, tensors["C=48 @ (16,180,320)"][1])
    report("add12 + dts",
           lambda x, y: depth_to_space(x + y),
           a12, tensors["C=12 @ (16,360,640)"][1])


if __name__ == "__main__":
    main()
