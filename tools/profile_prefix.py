"""Prefix bisection of the 720p inference tail + per-stage XLA FLOPs.

Times jitted PREFIXES of the tail (RC; RC+Mod; RC+Mod+recon; full) so the
deltas include exactly the inter-stage glue that separate-stage timings
miss, and reports XLA cost-model FLOPs per prefix so achieved TF/s is
grounded in the compiler's own accounting.

    python tools/profile_prefix.py [--chunk 8]
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


def timed_scan(fn, tr, h, t_, reps=8):
    """Pure device time: REPS serial evaluations in ONE program — the
    per-step timestamp column depends on the carry so XLA can neither
    hoist nor overlap the body; one sync, floor subtracted once.  Immune
    to the tunnel's per-dispatch dead time (which inflates per-call
    timings by ~20-30%% at these sizes)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    # inputs as jit ARGUMENTS (closures embed as HLO constants and can
    # exceed the remote-compile tunnel's request-body limit)
    @jax.jit
    def run(tr_, h_, tc_):
        def body(c, _):
            out = fn(tr_, h_, tc_ + (c * 1e-30).astype(tc_.dtype))
            # consume EVERY output leaf via a FULL reduction — a carry
            # fed by one element lets XLA dead-code-eliminate sibling
            # outputs (the 'full faster than final_only' artifact) or even
            # narrow pure-conv bodies to a one-pixel window
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
            return (s * 1e-30 + c * 0.5), None

        return lax.scan(body, jnp.float32(0.0), None, length=reps)[0]

    float(run(tr, h, t_))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(tr, h, t_))
        best = min(best, time.perf_counter() - t0)
    return max(best - _SYNC_FLOOR[0], 0.0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--hoist", action="store_true",
                    help="bisect the hoisted (from_timestamp_shared) tail")
    ap.add_argument("--rcsub", type=int, default=0,
                    help="rc_tail_subchunk for the hoisted tail")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated prefix subset (saves tunnel "
                         "compiles when bisecting one stage)")
    ap.add_argument("--scan", action="store_true",
                    help="time each prefix as a REPS-loop in one jit "
                         "(pure device time; hoist mode only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.utils.precision import to_bf16

    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=args.steps, dual_path=True,
        residual=True, detail_enabled=True, channels=(16, 24, 32, 64),
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True,
        rc_tail_subchunk=args.rcsub,
    )
    rng = np.random.default_rng(0)
    B, H, W, TB = 1, 720, 1280, 16
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    ts = jnp.asarray(np.full((B, 1), 0.3, np.float32))
    params = model.init(jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts)
    cp = to_bf16(params)

    floor = measure_sync_floor()
    print(f"sync floor: {floor*1e3:.2f} ms")
    CH = args.chunk
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    ff = cast(jnp.repeat(jnp.asarray(rng.standard_normal((1, 360, 640, 64)), jnp.float32), CH, 0))
    ef = cast(jnp.repeat(jnp.asarray(rng.standard_normal((1, 360, 640, 64)), jnp.float32), CH, 0))
    exr = cast(jnp.full((CH, 1), 0.42))
    fp = cast(jnp.repeat(frame, CH, 0))
    tcol = cast(jnp.asarray(np.linspace(0.05, 0.95, CH, dtype=np.float32))[:, None])

    if args.hoist:
        # hoisted-tail prefixes: trunk at B=1, per-timestamp tail at CH
        frame1, event1 = cast((frame, jnp.abs(event)))
        trunk_fn = jax.jit(lambda f, e: model.apply(cp, f, e, None, method=EVFIAutoEx.features))
        trunk = trunk_fn(frame1, event1)
        hoist_fn = jax.jit(lambda tr: model.apply(cp, tr, method=EVFIAutoEx.hoist))
        hoisted = hoist_fn(trunk)

        def prefix(which):
            def run(tr, h, t_):
                def body(m, tr_, h_, t__):
                    frame_feat, event_feat, ex_, frame_ = tr_
                    S = args.rcsub
                    if S and t__.shape[0] > S and t__.shape[0] % S == 0:
                        ev = jnp.concatenate([
                            m.residual_control(
                                None, None, t__[i * S:(i + 1) * S],
                                mode="tail", hoisted=h_["rc"])
                            for i in range(t__.shape[0] // S)
                        ], axis=0)
                    else:
                        ev = m.residual_control(None, None, t__, mode="tail", hoisted=h_["rc"])
                    if which == "rc":
                        return ev
                    fr = m.modification(frame_feat, ev, mode="tail", hoisted=h_["mod"])
                    if which == "mod":
                        return fr
                    from ebfi_tpu.ops.s2d import recon_s2d
                    cv = lambda mm: mm.variables["params"]["Conv_0"]
                    sharp = recon_s2d(
                        fr,
                        cv(m.recon_up)["kernel"], cv(m.recon_up)["bias"],
                        cv(m.recon_mid)["kernel"], cv(m.recon_mid)["bias"],
                        cv(m.recon_out)["kernel"], cv(m.recon_out)["bias"],
                    )
                    if which == "recon":
                        return sharp
                    if "stem" in h_:
                        final = sharp + m.detail(None, sharp, stem_pre=h_["stem"])
                    else:
                        fr_n = jnp.broadcast_to(frame_, (t__.shape[0], *frame_.shape[1:]))
                        final = sharp + m.detail(fr_n, sharp)
                    if which == "final_only":
                        return final
                    return sharp, final

                if which == "fts":
                    # the production path exactly (packed pipeline etc.)
                    return model.apply(
                        cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared
                    )[1]
                if which == "fts_nod":
                    # production path minus the detail branch: fts - fts_nod
                    # is the TRUE in-graph detail cost (the 'final_only'
                    # body approximates detail with unpacked io)
                    m2 = model.clone(detail_enabled=False)
                    return m2.apply(
                        cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared
                    )[1]
                return model.apply(cp, tr, h, t_, method=body)
            return jax.jit(run)

        results = {}
        names = ("rc", "mod", "recon", "final_only", "full", "fts", "fts_nod")
        if args.only:
            names = tuple(n for n in names if n in args.only.split(","))
        for which in names:
            fn = prefix(which)
            comp = fn.lower(trunk, hoisted, tcol).compile()
            fl = float(comp.cost_analysis().get("flops", float("nan")))
            if args.scan:
                t = timed_scan(fn, trunk, hoisted, tcol)
            else:
                t = timed(fn, trunk, hoisted, tcol)
            results[which] = (t, fl)
            print(f"prefix {which:10s}: {t*1e3:8.2f} ms = {t/CH*1e3:6.2f} ms/frame "
                  f"| {fl/1e12:7.3f} TFLOP ({fl/CH/1e12:6.3f}/frame) | {fl/t/1e12:6.1f} TF/s")

        keys = [k for k in ("rc", "mod", "recon", "final_only") if k in results]
        prev_t, prev_f = 0.0, 0.0
        print("\nstage deltas (prefix differences — include inter-stage glue):")
        for k in keys:
            t, fl = results[k]
            print(f"  +{k:10s}: {(t-prev_t)/CH*1e3:6.2f} ms/frame  "
                  f"{(fl-prev_f)/CH/1e12:6.3f} TFLOP/frame  "
                  f"{(fl-prev_f)/max(t-prev_t,1e-9)/1e12:6.1f} TF/s")
            prev_t, prev_f = t, fl
        if "full" in results and "final_only" in results:
            t_full, _ = results["full"]
            t_fo, _ = results["final_only"]
            print(f"  sharp output cost (full - final_only): {(t_full-t_fo)/CH*1e3:6.2f} ms/frame")
        return

    def prefix(which):
        def run(ff_, ef_, ex_, fp_, t_):
            def body(m, ff__, ef__, ex__, fp__, t__):
                ev = m.residual_control(ef__, ex__, t__)
                if which == "rc":
                    return ev
                fr = m.modification(ff__, ev)
                if which == "mod":
                    return fr
                from ebfi_tpu.ops.s2d import recon_s2d
                cv = lambda mm: mm.variables["params"]["Conv_0"]
                sharp = recon_s2d(
                    fr,
                    cv(m.recon_up)["kernel"], cv(m.recon_up)["bias"],
                    cv(m.recon_mid)["kernel"], cv(m.recon_mid)["bias"],
                    cv(m.recon_out)["kernel"], cv(m.recon_out)["bias"],
                )
                if which == "recon":
                    return sharp
                final = sharp + m.detail(fp__, sharp)
                if which == "final_only":
                    return final
                return sharp, final
            return model.apply(cp, ff_, ef_, ex_, fp_, t_, method=body)
        return jax.jit(run)

    results = {}
    for which in ("rc", "mod", "recon", "final_only", "full"):
        fn = prefix(which)
        comp = fn.lower(ff, ef, exr, fp, tcol).compile()
        fl = float(comp.cost_analysis().get("flops", float("nan")))
        t = timed(fn, ff, ef, exr, fp, tcol)
        results[which] = (t, fl)
        print(f"prefix {which:10s}: {t*1e3:8.2f} ms = {t/CH*1e3:6.2f} ms/frame "
              f"| {fl/1e12:7.3f} TFLOP ({fl/CH/1e12:6.3f}/frame) | {fl/t/1e12:6.1f} TF/s")

    keys = ["rc", "mod", "recon", "final_only"]
    prev_t, prev_f = 0.0, 0.0
    print("\nstage deltas (prefix differences — include inter-stage glue):")
    for k in keys:
        t, fl = results[k]
        print(f"  +{k:10s}: {(t-prev_t)/CH*1e3:6.2f} ms/frame  "
              f"{(fl-prev_f)/CH/1e12:6.3f} TFLOP/frame  "
              f"{(fl-prev_f)/max(t-prev_t,1e-9)/1e12:6.1f} TF/s")
        prev_t, prev_f = t, fl
    t_full, _ = results["full"]
    t_fo, _ = results["final_only"]
    print(f"  sharp output cost (full - final_only): {(t_full-t_fo)/CH*1e3:6.2f} ms/frame")


if __name__ == "__main__":
    main()
