"""Export a trained model to a serialized StableHLO artifact.

The serving-format analogue of the reference's ONNX/TensorRT path
(models/DCNv2/dcn_v2_onnx.py): `jax.export` serializes the jitted forward
(all custom ops included — FAC/DCN are ordinary XLA/StableHLO here, no
custom-op plugins needed, unlike the reference's TRT DCN rewrite) into a
portable artifact loadable by any StableHLO-compatible runtime or back
into JAX via `jax.export.deserialize`.

Usage:
  python tools/export_stablehlo.py --checkpoint out/models/.../ckpt \
      --output model.stablehlo --height 720 --width 1280 [--num_t 16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_model(checkpoint: str, height: int, width: int, num_t: int,
                 precision: str = "f32"):
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.infer.cli import load_model

    model, engine = load_model(checkpoint, precision=precision)
    tb = model.tb

    def fn(frame, event, ts, gt_ex):
        if num_t > 1:
            key = "batched"
            if key not in engine._multi_cache:
                engine._multi_cache[key] = engine._build_multi(key)
            return engine._multi_cache[key](frame, event, ts, gt_ex)
        sharp, final = engine._single_fn(frame, event, ts, gt_ex)
        return sharp, final

    shapes = (
        jax.ShapeDtypeStruct((1, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, height, width, 2 * tb), jnp.float32),
        jax.ShapeDtypeStruct((1, num_t) if num_t > 1 else (1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    exported = jax.export.export(jax.jit(fn))(*shapes)
    return exported


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_t", type=int, default=16)
    p.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    flags = p.parse_args()

    exported = export_model(
        flags.checkpoint, flags.height, flags.width, flags.num_t, flags.precision
    )
    blob = exported.serialize()
    with open(flags.output, "wb") as f:
        f.write(blob)
    print(f"wrote {flags.output}: {len(blob)/1e6:.1f} MB "
          f"(platforms={exported.platforms})")


if __name__ == "__main__":
    main()
