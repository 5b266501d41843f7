"""Mixed-precision helpers.

TPU MXU native compute is bfloat16; fp32 convs run multi-pass.  The
framework keeps parameters in fp32 and offers whole-graph bf16 casting for
the compute path: cast params + inputs to bf16, run, cast outputs back.
Integer/bool leaves are untouched.  Inference in bf16 is the production
mode; fp32 remains available for strict parity evaluation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_to_dtype(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def to_bf16(tree):
    return tree_to_dtype(tree, jnp.bfloat16)


def to_f32(tree):
    return tree_to_dtype(tree, jnp.float32)


def bf16_variant(apply_fn):
    """Wrap an apply-style fn: bf16 compute, fp32 in/out."""

    def wrapped(params, *args, **kwargs):
        out = apply_fn(to_bf16(params), *to_bf16(args), **to_bf16(kwargs))
        return to_f32(out)

    return wrapped
