"""LPIPS perceptual metric (alex backbone) in pure JAX.

Reference vendors LPIPS v0.1 (loss/PerceptualSimilarity/models/
networks_basic.py `PNetLin`: scaling layer -> alexnet relu taps ->
channel-unit-normalize -> squared diff -> 1x1 linear heads -> spatial mean
-> sum over layers), used as the inference metric (infer_ours.py:353,
restore.py:11-40).

Weights: the reference's vendored v0.1 linear heads ("alex.pth") ship with
this package pre-converted (`lpips_alex_linear.npz`, loaded by default);
the alexnet backbone comes from torchvision's pretrained model, which is
not in-image.  `load_lpips_params` converts a torch backbone checkpoint
when a path is provided; without one the metric falls back to
deterministic random features.  The returned LPIPS object then reports
``comparable == False`` — callers (the infer CLI) must omit or tag such
values rather than writing them into result files as if they were
published-comparable LPIPS numbers.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

logger = logging.getLogger(__name__)

# Alexnet feature-stage geometry: (out_ch, kernel, stride, pad), with 3x3/s2
# max-pools after stages 0, 1, and 4.
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool_3x3s2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: (B,H,W,3) in [-1,1] -> list of 5 relu feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, k, s, p) in enumerate(_ALEX_CONVS):
        h = lax.conv_general_dilated(
            h,
            params[f"conv{i}_w"],
            (s, s),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _max_pool_3x3s2(h)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance.  Images NHWC in [0,1] (normalize=True path,
    restore.py:19-40)."""

    def __init__(self, params: dict):
        params = dict(params)
        # provenance flag (set by load_lpips_params): random-feature
        # backbones produce self-consistent but non-comparable values
        self.comparable = bool(params.pop("_real_backbone", False))
        self.params = params
        self._fn = jax.jit(self._distance)

    def _distance(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        p = 2.0 * pred - 1.0
        t = 2.0 * target - 1.0
        fp = _alex_features(self.params, p)
        ft = _alex_features(self.params, t)
        total = 0.0
        for i, (a, b) in enumerate(zip(fp, ft)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.params[f"lin{i}_w"]  # (C,)
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total  # (B,)

    def __call__(self, pred, target) -> float:
        return float(jnp.mean(self._fn(jnp.asarray(pred), jnp.asarray(target))))


def load_lpips_params(
    linear_path: Optional[str] = None,
    backbone_path: Optional[str] = None,
    seed: int = 0,
) -> dict:
    """Build LPIPS params from torch checkpoints.

    linear_path: the reference's `alex.pth` linear heads
      (keys ``lin{i}.model.1.weight`` of shape (1, C, 1, 1)); defaults to
      the pre-converted copy shipped with the package.
    backbone_path: a torchvision alexnet state_dict
      (keys ``features.{0,3,6,8,10}.{weight,bias}``).

    The result carries ``_real_backbone`` so LPIPS can report whether its
    values are comparable to published numbers.
    """
    params: dict = {"_real_backbone": backbone_path is not None}
    rng = np.random.default_rng(seed)

    if backbone_path is not None:
        import torch

        sd = torch.load(backbone_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        layer_ids = [0, 3, 6, 8, 10]
        for i, lid in enumerate(layer_ids):
            w = sd[f"features.{lid}.weight"].numpy()  # (O,I,kh,kw)
            b = sd[f"features.{lid}.bias"].numpy()
            params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
            params[f"conv{i}_b"] = jnp.asarray(b)
    else:
        logger.warning(
            "LPIPS: no alexnet backbone checkpoint provided; using random "
            "features. Values are self-consistent but NOT comparable to "
            "published LPIPS numbers."
        )
        cin = 3
        for i, (cout, k, _, _) in enumerate(_ALEX_CONVS):
            std = float(np.sqrt(2.0 / (k * k * cin)))
            params[f"conv{i}_w"] = jnp.asarray(
                rng.normal(0, std, (k, k, cin, cout)).astype(np.float32)
            )
            params[f"conv{i}_b"] = jnp.zeros((cout,), jnp.float32)
            cin = cout

    if linear_path is not None:
        import torch

        lin = torch.load(linear_path, map_location="cpu")
        for i in range(5):
            w = lin[f"lin{i}.model.1.weight"].numpy().reshape(-1)  # (C,)
            params[f"lin{i}_w"] = jnp.asarray(np.maximum(w, 0))
    else:
        # default: the reference's vendored v0.1 heads, pre-converted
        packed = os.path.join(os.path.dirname(__file__), "lpips_alex_linear.npz")
        heads = np.load(packed)
        for i in range(5):
            params[f"lin{i}_w"] = jnp.asarray(np.maximum(heads[f"lin{i}"], 0))

    return params
