"""MXU ceiling for the mod_fac kernel's exact dot shape.

The fused kernel's per-step MXU work is (TH*W, 9C) @ (9C, KKC) in bf16
with f32 accumulation.  The kernel measures ~110 TF/s end-to-end; this
times the bare dot (XLA, scan-looped) at the same shape to separate
"kernel overhead" from "that's just what the MXU does at this shape".

    python tools/microbench_dot.py [--m 1280 --k 576 --n 1600]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1280)
    ap.add_argument("--k", type=int, default=576)
    ap.add_argument("--n", type=int, default=1600)
    ap.add_argument("--reps", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    M, K, N, reps = args.m, args.k, args.n, args.reps
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    floor = (time.perf_counter() - t0) / 10
    print(f"sync floor {floor*1e3:.1f} ms")

    @jax.jit
    def run(x_, w_):
        def body(c, _):
            d = jnp.dot(x_ + (c * 1e-30).astype(x_.dtype), w_,
                        preferred_element_type=jnp.float32)
            return jnp.sum(d) * 1e-30 + c * 0.5, None

        return lax.scan(body, jnp.float32(0.0), None, length=reps)[0]

    float(run(x, w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, w))
        best = min(best, time.perf_counter() - t0)
    t = max(best - floor, 0) / reps
    fl = 2 * M * K * N
    print(f"dot ({M},{K})@({K},{N}) bf16->f32: {t*1e6:8.1f} us "
          f"| {fl/1e9:6.2f} GFLOP | {fl/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
