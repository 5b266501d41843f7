"""Dump + summarize the optimized HLO of the production tail (fts).

Prints every copy/transpose/reshape-rooted fusion with its shape and an
estimated byte volume, sorted desc — the candidates for in-graph layout
taxes that standalone stage profiles don't see.

    python tools/dump_fts_hlo.py [--chunk 16] [--out /tmp/fts.hlo]
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--out", type=str, default="/tmp/fts.hlo")
    ap.add_argument("--nod", action="store_true", help="dump fts_nod instead")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from ebfi_tpu.models import EVFIAutoEx
    from ebfi_tpu.utils.precision import to_bf16

    CH = args.chunk
    model = EVFIAutoEx(
        frame_basech=64, event_basech=64, inter_ch=64, tb=16,
        blurry_fashion="RGBLap", bl_in=4, step=12, dual_path=True,
        residual=True, detail_enabled=not args.nod,
        channels=(16, 24, 32, 64),
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True,
    )
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 1, (1, 720, 1280, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((1, 720, 1280, 32)).astype(np.float32))
    ts = jnp.asarray(np.full((1, 1), 0.3, np.float32))
    params = model.init(jax.random.key(0), frame[:, :64, :64], event[:, :64, :64], ts)
    cp = to_bf16(params)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    frame1, event1 = cast((frame, jnp.abs(event)))
    trunk = jax.jit(
        lambda f, e: model.apply(cp, f, e, None, method=EVFIAutoEx.features)
    )(frame1, event1)
    hoisted = jax.jit(lambda tr: model.apply(cp, tr, method=EVFIAutoEx.hoist))(trunk)
    tcol = cast(jnp.asarray(np.linspace(0.05, 0.95, CH, dtype=np.float32))[:, None])

    fn = jax.jit(
        lambda tr, h, t_: model.apply(
            cp, tr, h, t_, method=EVFIAutoEx.from_timestamp_shared
        )[1]
    )
    comp = fn.lower(trunk, hoisted, tcol).compile()
    txt = comp.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB HLO to {args.out}", flush=True)

    dtype_bytes = {"bf16": 2, "f32": 4, "s32": 4, "s8": 1, "u8": 1,
                   "pred": 1, "f16": 2, "u32": 4}

    def shape_bytes(s):
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    # top-level copies / transposes / bitcast-free reshapes in the entry +
    # fusion computations whose root is one of those
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\S+) (copy|transpose|reshape)\(", ls)
        if m:
            name, shape, kind = m.groups()
            rows.append((shape_bytes(shape), kind, shape, name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n{len(rows)} copy/transpose/reshape ops, {total/1e6:.1f} MB total "
          f"output bytes ({total/1e6/CH:.2f} MB/frame)")
    for b, kind, shape, name in rows[:40]:
        print(f"  {b/1e6:9.2f} MB  {kind:9s} {shape:36s} {name}")

    # custom-call (Pallas) operand/result shapes — layout mismatches show
    # as copies feeding these
    print("\ncustom-calls:")
    for line in txt.splitlines():
        if "custom-call" in line and "tpu_custom_call" in line:
            print("  " + line.strip()[:220])


if __name__ == "__main__":
    main()
