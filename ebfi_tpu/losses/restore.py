"""Restoration losses and metrics.

JAX losses replicating loss/restore.py:
- :func:`laplacian_loss` — 5-level Laplacian-pyramid L1, level weights 2^i
  (restore.py:146-210).
- :func:`census_loss` — 7x7 census-transform (ternary) distance with a
  validity mask (restore.py:108-142).
- :func:`charbonnier_loss` — sum sqrt(d^2 + eps), eps=1e-3 (restore.py:95-105).

Numpy metrics replicating skimage as the reference calls it (quirks
included; restore.py:43-92):
- :func:`psnr_metric` — per-channel with ``data_range = tgt[c].max() -
  tgt.min()`` (mixed per-channel max / global min), channel-averaged.
- :func:`ssim_metric` — uniform 7x7 window, unbiased covariance, and the
  float-input default ``data_range=2.0`` skimage assumed when none is given.

All image tensors are NHWC in [0, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ----------------------------------------------------------------------- #
# Laplacian pyramid

_GAUSS_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
_GAUSS_2D = np.outer(_GAUSS_1D, _GAUSS_1D) / 256.0  # (5, 5)


def _gauss_blur(x: jax.Array, factor: float = 1.0) -> jax.Array:
    """Depthwise 5x5 Gaussian with reflect padding (restore.py:147-163)."""
    C = x.shape[-1]
    kern = jnp.asarray(_GAUSS_2D * factor, x.dtype)
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _reduce(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2 (restore.py:189-190)."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _expand(x: jax.Array) -> jax.Array:
    """Zero-stuff odd rows/cols then blur with 4x Gaussian
    (restore.py:192-203)."""
    B, H, W, C = x.shape
    up = jnp.zeros((B, H * 2, W * 2, C), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    return _gauss_blur(up, factor=4.0)


def laplacian_pyramid(x: jax.Array, max_level: int = 5):
    pyramid = []
    current = x
    for _ in range(max_level - 1):
        blurred = _gauss_blur(current)
        reduced = _reduce(blurred)
        pyramid.append(current - _expand(reduced))
        current = reduced
    pyramid.append(current)
    return pyramid


def laplacian_loss(pred: jax.Array, target: jax.Array, max_level: int = 5) -> jax.Array:
    """sum_i 2^i * L1_sum(Lap_i(pred), Lap_i(target)) (restore.py:205-210)."""
    px = laplacian_pyramid(pred, max_level)
    py = laplacian_pyramid(target, max_level)
    return sum(
        (2.0 ** i) * jnp.sum(jnp.abs(a - b)) for i, (a, b) in enumerate(zip(px, py))
    )


# ----------------------------------------------------------------------- #
# Census / ternary loss

def _census_transform(x: jax.Array, patch_size: int) -> jax.Array:
    """Normalized local-difference descriptor (restore.py:119-126)."""
    gray = jnp.mean(x, axis=-1, keepdims=True)  # (B,H,W,1)
    p = patch_size // 2
    gp = jnp.pad(gray, ((0, 0), (p, p), (p, p), (0, 0)))
    # Extract all patch_size^2 shifted neighborhoods (== conv with identity
    # kernels, restore.py:113-121, but shifts fuse better).
    B, H, W, _ = x.shape
    patches = [
        gp[:, dy : dy + H, dx : dx + W, 0]
        for dy in range(patch_size)
        for dx in range(patch_size)
    ]
    patches = jnp.stack(patches, axis=-1)  # (B,H,W,P^2)
    loc_diff = patches - gray
    return loc_diff / jnp.sqrt(0.81 + loc_diff**2)


def census_loss(pred: jax.Array, target: jax.Array, patch_size: int = 7) -> jax.Array:
    """Ternary.forward (restore.py:135-142): soft-Hamming distance of census
    descriptors, target branch stop-gradiented, interior-masked mean."""
    dx = _census_transform(pred, patch_size)
    dy = lax.stop_gradient(_census_transform(target, patch_size))
    diff = dx - dy
    dist = jnp.mean(diff**2 / (0.1 + diff**2), axis=-1, keepdims=True)
    p = patch_size // 2
    B, H, W, _ = pred.shape
    mask = jnp.zeros((1, H, W, 1), pred.dtype)
    mask = mask.at[:, p : H - p, p : W - p, :].set(1.0)
    return jnp.mean(dist * mask)


# ----------------------------------------------------------------------- #
# Simple losses

def charbonnier_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-3) -> jax.Array:
    d = pred - target
    return jnp.sum(jnp.sqrt(d * d + eps))


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


# ----------------------------------------------------------------------- #
# Metrics (numpy, skimage-parity)

def _psnr(true: np.ndarray, test: np.ndarray, data_range: float) -> float:
    err = np.mean((true.astype(np.float64) - test.astype(np.float64)) ** 2)
    return float(10.0 * np.log10((data_range**2) / err))


def psnr_metric(pred: np.ndarray, target: np.ndarray) -> float:
    """psnr_loss.__call__ (restore.py:67-92): squeeze, per-channel PSNR with
    ``data_range = tgt[c].max() - tgt.min()``, channel mean.  (C,H,W) or
    (H,W) after squeeze."""
    pred = np.squeeze(np.asarray(pred))
    target = np.squeeze(np.asarray(target))
    if pred.ndim == 3:
        vals = []
        for c in range(pred.shape[0]):
            data_range = float(target[c].max() - target.min())
            vals.append(_psnr(target[c], pred[c], data_range))
        return float(np.mean(vals))
    # grayscale path clips to [0,1] and uses the float-dtype default range 2.0
    return _psnr(np.clip(target, 0, 1), np.clip(pred, 0, 1), 2.0)


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.uniform_filter semantics (reflect boundary) in 2D."""
    p_lo = size // 2
    p_hi = size - 1 - p_lo
    xp = np.pad(x, ((p_lo, p_hi), (p_lo, p_hi)), mode="reflect")
    c = np.cumsum(np.cumsum(xp, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    H, W = x.shape
    tot = (
        c[size : size + H, size : size + W]
        - c[0:H, size : size + W]
        - c[size : size + H, 0:W]
        + c[0:H, 0:W]
    )
    return tot / (size * size)


def _ssim_2d(x: np.ndarray, y: np.ndarray, win: int, data_range: float) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    NP = win * win
    cov_norm = NP / (NP - 1)
    ux, uy = _uniform_filter(x, win), _uniform_filter(y, win)
    uxx, uyy, uxy = (
        _uniform_filter(x * x, win),
        _uniform_filter(y * y, win),
        _uniform_filter(x * y, win),
    )
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def ssim_metric(pred: np.ndarray, target: np.ndarray, data_range: float = 2.0) -> float:
    """ssim_loss.__call__ (restore.py:43-64): squeeze, per-channel SSIM with
    skimage defaults (uniform 7x7, float data_range 2.0), channel mean."""
    pred = np.squeeze(np.asarray(pred))
    target = np.squeeze(np.asarray(target))
    if pred.ndim == 3:
        return float(
            np.mean([_ssim_2d(pred[c], target[c], 7, data_range) for c in range(pred.shape[0])])
        )
    return _ssim_2d(pred, target, 7, data_range)
