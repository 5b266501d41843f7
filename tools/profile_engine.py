"""Bisect the engine-level overhead: bare hoisted tail vs trunk+hoist vs
the full jitted engine `run`, all queued-pipelined with one sync.

    python tools/profile_engine.py [--chunk 16] [--iters 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.infer import InferenceEngine
    from ebfi_tpu.utils.precision import to_bf16

    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
    )
    fast = model.clone(fast_recon=True, fast_detail=True, fast_mod=True,
                       fast_control=True)
    rng = np.random.default_rng(0)
    B, H, W, TB, NUM_I = 1, 720, 1280, 16, 16
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(np.abs(rng.standard_normal((B, H, W, 2 * TB))).astype(np.float32))
    ts = jnp.asarray(np.linspace(0, 1, NUM_I, dtype=np.float32)[None])
    params = model.init(jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts[:, :1])
    cp = to_bf16(params)
    CH = args.chunk
    IT = args.iters

    def pipelined(label, fn, per_call_frames):
        # warmup
        float(jax.tree.leaves(fn())[0].ravel()[0])
        t0 = time.perf_counter()
        acc = [fn() for _ in range(IT)]
        s = sum(jax.tree.leaves(a)[0].ravel()[0] for a in acc)
        float(s)
        dt = (time.perf_counter() - t0) / IT
        print(f"{label:28s}: {dt*1e3:8.2f} ms/call = "
              f"{dt/per_call_frames*1e3:6.2f} ms/frame "
              f"({per_call_frames/dt:.1f} fps)")
        return dt

    frame_b = frame.astype(jnp.bfloat16)
    event_b = event.astype(jnp.bfloat16)
    trunk_fn = jax.jit(lambda f, e: fast.apply(cp, f, e, None, method=EVFIAutoEx.features))
    trunk = trunk_fn(frame_b, event_b)
    hoist_fn = jax.jit(lambda tr: fast.apply(cp, tr, method=EVFIAutoEx.hoist))
    hoisted = hoist_fn(trunk)
    tcol = jnp.asarray(np.linspace(0.03, 0.97, CH, np.float32))[:, None].astype(jnp.bfloat16)

    tail_fn = jax.jit(lambda tr, h, t_: fast.apply(
        cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared))

    pipelined("trunk only", lambda: trunk_fn(frame_b, event_b), NUM_I)
    pipelined("hoist only", lambda: hoist_fn(trunk), NUM_I)
    pipelined("tail only (bf16 out)", lambda: tail_fn(trunk, hoisted, tcol), CH)

    def tail_f32():
        s, f = tail_fn(trunk, hoisted, tcol)
        return f.astype(jnp.float32)
    tail_f32_j = jax.jit(lambda tr, h, t_: fast.apply(
        cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared)[1].astype(jnp.float32))
    pipelined("tail+f32 final", lambda: tail_f32_j(trunk, hoisted, tcol), CH)

    eng = InferenceEngine(model, params, precision="bf16", multi_chunk=CH)
    pipelined("engine (outputs=final)",
              lambda: eng.interpolate(frame, event, ts, outputs="final")[1], NUM_I)
    pipelined("engine (outputs=both)",
              lambda: eng.interpolate(frame, event, ts)[1], NUM_I)


if __name__ == "__main__":
    main()
