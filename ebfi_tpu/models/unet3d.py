"""UNet3d_18: detail-restoration branch (3D R3D-18 encoder + transpose-conv
decoder with SE gating).

Reference: models/Ours/model_singleframe.py:170-223 (UNet3d_18),
models/model_misc/resnet_3D.py (r3d_18 encoder, `bn=False` -> all
batchnorms are identity, which is how the model is instantiated:
model_singleframe.py:269).

Layout: the two frames are stacked on a depth axis -> (B, T=2, H, W, C)
NDHWC; all convs run through `lax.conv_general_dilated` in that layout.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv3D, ConvTranspose3D, SEGating, kaiming_out_init, torch_default_bias_init


class _BasicBlock3D(nn.Module):
    """R3D BasicBlock with SEGating, bn-free (resnet_3D.py:108-141)."""

    planes: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv3D(
            self.planes, (3, 3, 3), self.stride, (1, 1, 1), use_bias=False,
            kernel_init=kaiming_out_init(), name="conv1",
        )(x)
        out = nn.relu(out)
        out = Conv3D(
            self.planes, (3, 3, 3), (1, 1, 1), (1, 1, 1), use_bias=False,
            kernel_init=kaiming_out_init(), name="conv2",
        )(out)
        out = SEGating(name="fg")(out)
        if self.downsample:
            residual = Conv3D(
                self.planes, (1, 1, 1), self.stride, (0, 0, 0), use_bias=False,
                kernel_init=kaiming_out_init(), name="downsample",
            )(x)
        return nn.relu(out + residual)


class _Encoder3D(nn.Module):
    """r3d_18 (resnet_3D.py:218-327): stem + 4 layers of 2 BasicBlocks."""

    channels: Sequence[int]  # e.g. (16, 24, 32, 64)

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, 3)
        c0, c1, c2, c3 = self.channels
        stem = Conv3D(
            c0, (3, 7, 7), (1, 2, 2), (1, 3, 3), use_bias=False,
            kernel_init=kaiming_out_init(), name="stem",
        )(x)
        x0 = nn.relu(stem)
        x1 = _BasicBlock3D(c0, name="layer1_0")(x0)
        x1 = _BasicBlock3D(c0, name="layer1_1")(x1)
        x2 = _BasicBlock3D(c1, (1, 2, 2), downsample=True, name="layer2_0")(x1)
        x2 = _BasicBlock3D(c1, name="layer2_1")(x2)
        x3 = _BasicBlock3D(c2, (1, 2, 2), downsample=True, name="layer3_0")(x2)
        x3 = _BasicBlock3D(c2, name="layer3_1")(x3)
        x4 = _BasicBlock3D(c3, (1, 1, 1), downsample=True, name="layer4_0")(x3)
        x4 = _BasicBlock3D(c3, name="layer4_1")(x4)
        return x0, x1, x2, x3, x4


class _ConvSE(nn.Module):
    """Conv_3d: conv3d + SEGating (resnet_3D.py:407-417)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = Conv3D(self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1), name="conv")(x)
        return SEGating(name="fg")(y)


class _UpConvSE(nn.Module):
    """upConv3D transpose mode: ConvTranspose3d + SEGating
    (resnet_3D.py:382-405)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose3D(self.features, (3, 4, 4), (1, 2, 2), (1, 1, 1), name="upconv")(x)
        return SEGating(name="fg")(y)


class UNet3d18(nn.Module):
    """Full detail branch (model_singleframe.py:170-223)."""

    channels: Sequence[int] = (32, 64, 96, 128)

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array) -> jax.Array:
        """img0, img1: (B, H, W, 3) with H, W divisible by 8 -> (B, H, W, 3)."""
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        rc = list(self.channels)[::-1]  # e.g. [64, 32, 24, 16]

        images = jnp.stack((img0, img1), axis=1)  # (B, 2, H, W, 3)
        x0, x1, x2, x3, x4 = _Encoder3D(self.channels, name="encoder")(images)

        d3 = lrelu(_ConvSE(rc[1], name="dec0")(x4))
        d3 = jnp.concatenate([d3, x3], axis=-1)
        d2 = lrelu(_UpConvSE(rc[2], name="dec1")(d3))
        d2 = jnp.concatenate([d2, x2], axis=-1)
        d1 = lrelu(_UpConvSE(rc[3], name="dec2")(d2))
        d1 = jnp.concatenate([d1, x1], axis=-1)
        d0 = lrelu(_ConvSE(rc[3], name="dec3")(d1))
        d0 = jnp.concatenate([d0, x0], axis=-1)
        dout = lrelu(_UpConvSE(rc[3], name="dec4")(d0))

        # unbind the depth axis and concat channels (model_singleframe.py:218)
        B, T, H, W, C = dout.shape
        dout = dout.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)

        fused = nn.Conv(
            rc[3], (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            name="feature_fuse",
        )(dout)
        fused = lrelu(fused)

        padded = jnp.pad(fused, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        out = nn.Conv(
            3, (7, 7), padding="VALID",
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_default_bias_init(rc[3] * 49),
            name="outconv",
        )(padded)
        return out
