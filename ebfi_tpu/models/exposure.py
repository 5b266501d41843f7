"""ExposureDecision: exposure-duty-cycle regressor.

Reference: models/Ours/model_singleframe.py:23-76.  From the flattened event
stack and a blurriness map it regresses the exposure duty in [0, 1]:
feature-extract both, GroupNorm both, correlate (elementwise product),
channel attention from the pooled correlation, then a 2-conv head pooled to
one sigmoid scalar per sample.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvLayer


class ExposureDecision(nn.Module):
    """Args mirror the reference constructor (model_singleframe.py:24)."""

    event_in: int = 32       # 2*TB
    bl_in: int = 1           # blurriness-map channels (BLInch)
    inter_ch: int = 64
    groups: int = 4
    norm: Optional[str] = None
    activation: str = "LeakyReLU"

    @nn.compact
    def __call__(self, event: jax.Array, blurry_level: jax.Array) -> jax.Array:
        """event: (B, H, W, 2*TB); blurry_level: (B, H, W, bl_in) -> (B, 1)."""
        event_feat = ConvLayer(
            self.inter_ch, 3, 1, 1, self.activation, self.norm, name="event_feat"
        )(event)
        bl_feat = ConvLayer(
            self.inter_ch, 3, 1, 1, self.activation, self.norm, name="bl_feat"
        )(blurry_level)

        # The reference shares one GroupNorm module for both branches
        # (model_singleframe.py:33,66-67) — mirror that with a single
        # parameterized module applied twice.
        group_norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="group_norm")
        corre = group_norm(event_feat) * group_norm(bl_feat)
        atten = nn.sigmoid(jnp.mean(corre, axis=(1, 2), keepdims=True))  # (B,1,1,C)

        selected = event_feat * atten
        h = ConvLayer(self.inter_ch, 3, 1, 1, self.activation, self.norm, name="head1")(
            jnp.concatenate([selected, bl_feat], axis=-1)
        )
        h = ConvLayer(1, 3, 1, 1, None, self.norm, name="head2")(h)
        return nn.sigmoid(jnp.mean(h, axis=(1, 2)).reshape(-1, 1))  # (B, 1)
