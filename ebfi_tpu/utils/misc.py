"""Small utilities (myutils/utils.py misc equivalents)."""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def normalize_event_tensor(x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Normalize the NONZERO entries of an event tensor to zero mean / unit
    std (myutils/utils.py:52-78's `normalize_tensor`), vectorized (the
    reference masks in place)."""
    nz = (x != 0).astype(x.dtype)
    n = jnp.maximum(nz.sum(), 1.0)
    mean = (x * nz).sum() / n
    var = (((x - mean) * nz) ** 2).sum() / n
    return jnp.where(nz > 0, (x - mean) / jnp.sqrt(var + eps), x)


def to_uint8_image(x) -> np.ndarray:
    """float [0,1] (H, W, C) -> uint8 (the `torch2cv2` analogue)."""
    return (np.clip(np.asarray(x), 0.0, 1.0) * 255).astype(np.uint8)


def inf_loop(iterable):
    """Endlessly repeat a dataloader (myutils/utils.py:147-153)."""
    for loader in itertools.repeat(iterable):
        yield from loader


def param_count(params) -> int:
    """Total parameter count (BaseModel.__str__ analogue, base.py:25-33)."""
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
