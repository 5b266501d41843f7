"""Microbenchmarks for the RC-stage conv mix on TPU.

The axon tunnel adds ~40-50 ms host-sync latency per dispatch, so each
candidate op is iterated REPS times inside a single jitted lax.scan and
synced once; per-op time = (t_loop - t_empty) / REPS.
"""
import time
import numpy as np

REPS = 20


def timed(fn, *args, iters=3, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    rng = np.random.default_rng(0)
    B, H, W, C = 8, 360, 640, 64
    dt = jnp.bfloat16

    def conv(x, w, pad, stride=(1, 1)):
        return lax.conv_general_dilated(
            x, w, stride, [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dt)

    def loop(op):
        """REPS applications of op, serialized via a data dependency that
        keeps the compiler from hoisting (output feeds next input)."""
        def fn(x, *ws):
            def body(c, _):
                y = op(c, *ws)
                # re-center so magnitudes stay sane; fused elementwise
                return (y - jnp.mean(y) * 0).astype(c.dtype), ()
            y, _ = lax.scan(body, x, None, length=REPS)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(fn)

    base_sync = timed(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), mk(8, 8))
    print(f"tunnel sync overhead ~ {base_sync*1e3:.1f} ms (subtracted)")

    cases = []

    x = mk(B, H, W, C)
    w = mk(3, 3, C, C)
    cases.append(("3x3 64->64 (8,360,640)", loop(lambda x, w: conv(x, w, 1)), (x, w),
                  2 * 9 * C * C * B * H * W))

    w2 = mk(3, 3, C, 2 * C)
    cases.append(("3x3 64->128", loop(lambda x, w: conv(x, w, 1)[..., :C]), (x, w2),
                  2 * 9 * C * 2 * C * B * H * W))

    xs = mk(B, H // 2 + 1, W // 2 + 1, 4 * C)
    ws = mk(2, 2, 4 * C, 4 * C)
    def s2d_op(x, w):
        y = conv(x, w, 0)
        return jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
    cases.append(("2x2 256->256 VALID (s2d shape)", loop(s2d_op), (xs, ws),
                  2 * 4 * 4 * C * 4 * C * B * (H // 2) * (W // 2)))

    ws2 = mk(2, 2, 4 * C, 8 * C)
    def s2d_op2(x, w):
        y = conv(x, w, 0)[..., : 4 * C]
        return jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
    cases.append(("2x2 256->512 VALID (s2d merged)", loop(s2d_op2), (xs, ws2),
                  2 * 4 * 4 * C * 8 * C * B * (H // 2) * (W // 2)))

    xi = mk(B * H * W // 4, 9 * C)
    wi = mk(9 * C, C)
    def dot_op(a, b):
        y = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)
        return jnp.tile(y, (1, 9))
    cases.append(("dot M=460k K=576 N=64", loop(dot_op), (xi, wi),
                  2 * xi.shape[0] * 9 * C * C))

    xj = mk(B * (H // 2) * (W // 2), 16 * C)
    wj = mk(16 * C, 4 * C)
    def dot_op2(a, b):
        y = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)
        return jnp.tile(y, (1, 4))
    cases.append(("dot M=460k K=1024 N=256", loop(dot_op2), (xj, wj),
                  2 * xj.shape[0] * 16 * C * 4 * C))

    # elementwise bandwidth probe
    cases.append(("elementwise x+1 (236MB)", loop(lambda x: x + 1), (x,), 0))

    for name, f, args, fl in cases:
        t = (timed(f, *args) - base_sync) / REPS
        tf = fl / t / 1e12 if fl else 0
        gb = 0 if fl else 2 * np.prod(args[0].shape) * 2 / t / 1e9
        extra = f"{tf:7.1f} TF/s" if fl else f"{gb:7.1f} GB/s"
        print(f"{name:36s} {t*1e3:8.3f} ms {extra}")


if __name__ == "__main__":
    main()
