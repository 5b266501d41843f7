"""Warping / gradient utilities for the flow-based losses.

- :func:`grid_sample`: bilinear sampling at normalized grid positions with
  zero padding, matching `torch.nn.functional.grid_sample(align_corners
  =False is NOT used by the reference; it relies on the default True-era
  semantics of its torch version)` — we implement align_corners=True, which
  is what the reference's normalization (2*x/(W-1)-1) composes with.
- :func:`sobel_gradients`: replication-padded 3x3 Sobel / 8
  (myutils/gradients.py:7-33).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    """img: (B, H, W, C); grid: (B, H', W', 2) with (x, y) in [-1, 1]
    (align_corners=True convention).  Returns (B, H', W', C), zeros outside.
    """
    B, H, W, C = img.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    out = jnp.zeros(grid.shape[:-1] + (C,), img.dtype)
    imgf = img.reshape(B, H * W, C)
    for dy in (0, 1):
        for dx in (0, 1):
            xc = x0 + dx
            yc = y0 + dy
            w = (1 - jnp.abs(gx - xc)) * (1 - jnp.abs(gy - yc))
            valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
            xi = jnp.clip(xc.astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(yc.astype(jnp.int32), 0, H - 1)
            flat = (yi * W + xi).reshape(B, -1)
            v = jnp.take_along_axis(imgf, flat[..., None], axis=1)
            v = v.reshape(out.shape)
            out = out + jnp.where(valid[..., None], w[..., None] * v, 0.0)
    return out


_SOBEL_X = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = jnp.asarray([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]]) / 8.0


def sobel_gradients(x: jax.Array):
    """x: (B, H, W, 1) -> (gradx, grady) each (B, H, W, 1), replication pad."""
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)), mode="edge")
    win = [
        xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
        for dy in range(3)
        for dx in range(3)
    ]
    gradx = sum(w * _SOBEL_X[i // 3, i % 3] for i, w in enumerate(win))
    grady = sum(w * _SOBEL_Y[i // 3, i % 3] for i, w in enumerate(win))
    return gradx[..., None], grady[..., None]
