"""Standalone microbench of the shared-ff mod_fac kernel at the production
shape (ev batch 16, ff batch 1, 360x640x64, K=5), sync-floor corrected.

    EBFI_MODFAC_TAPG=4 python tools/microbench_modfac.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.ops.pallas.mod_fac import (
        _TAP_GROUP,
        modification_fac_fused_shared_packed,
    )

    N, H, W, C, K = 16, 360, 640, 64, 5
    rng = np.random.default_rng(0)
    ev = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    ff = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    wk = jnp.asarray(0.05 * rng.standard_normal((3, 3, 2 * C, K * K * C)), jnp.bfloat16)
    bk = jnp.asarray(0.05 * rng.standard_normal((K * K * C,)), jnp.bfloat16)

    fn = jax.jit(lambda a, b: modification_fac_fused_shared_packed(a, b, wk, bk, K))
    float(fn(ev, ff).sum())  # compile + warmup

    z = jnp.zeros(())
    float((z + 0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float((z + 0).ravel()[0])
    floor = (time.perf_counter() - t0) / 10

    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        float(fn(ev, ff).sum())
    dt = (time.perf_counter() - t0) / iters - floor
    # FLOPs: ev-half bank conv per frame + ff-half once + FAC apply
    fl = 2 * 9 * C * (K * K * C) * H * W * (N + 1) + 2 * K * K * C * H * W * N
    print(f"TAPG={_TAP_GROUP}: {dt*1e3:8.2f} ms = {dt/N*1e3:6.2f} ms/frame "
          f"| {fl/dt/1e12:6.1f} TF/s (floor {floor*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
