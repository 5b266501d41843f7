"""Discriminator family for the adversarial losses.

Flax ports of loss/discriminator.py: the shared conv ladder (depth-7, BN
optional, LeakyReLU 0.2, channel doubling every other layer) + linear
classifier head; variants:
  Discriminator           — single-frame (discriminator.py:19-57)
  TemporalDiscriminator   — 3D-conv over (prev, x, next) (:60-110)
  FIDiscriminator         — channel-concat frame pair (:113-153)
  FICondDiscriminator     — 3D-conv variant, 8ch (:155-207)
  STDiscriminator         — 2-stream spatial + temporal-diff (:208-263)

Batch norm runs in training mode (batch statistics) like the reference's
default-`train()` discriminators; implemented stateless (no running stats)
since the reference never runs its discriminators in eval mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import torch_default_kernel_init, torch_default_bias_init


def _batch_stat_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    bn: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=torch_default_kernel_init(),
        )(x)
        if self.bn:
            y = _batch_stat_norm(y)
            y = y * self.param("scale", nn.initializers.ones, (self.features,))
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return nn.leaky_relu(y, 0.2)


class _ConvLadder(nn.Module):
    """depth-7 ladder: stride-2 on even layers, channels x2 on odd."""

    base: int = 64
    depth: int = 7
    bn: bool = True

    @nn.compact
    def __call__(self, x):
        out_ch = self.base
        x = _BasicBlock(out_ch, bn=self.bn, name="block0")(x)
        for i in range(self.depth):
            if i % 2 == 1:
                stride, out_ch = 1, out_ch * 2
            else:
                stride = 2
            x = _BasicBlock(out_ch, stride=stride, bn=self.bn, name=f"block{i+1}")(x)
        return x


class _Classifier(nn.Module):
    @nn.compact
    def __call__(self, flat):
        h = nn.Dense(1024, kernel_init=torch_default_kernel_init(),
                     bias_init=torch_default_bias_init(flat.shape[-1]))(flat)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(1, kernel_init=torch_default_kernel_init(),
                        bias_init=torch_default_bias_init(1024))(h)


class Discriminator(nn.Module):
    patch_size: int
    gan_type: str = "GAN"

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        bn = self.gan_type != "WGAN_GP"
        f = _ConvLadder(bn=bn, name="features")(x)
        return _Classifier(name="classifier")(f.reshape(f.shape[0], -1))


class _Conv3DPair(nn.Module):
    """Two (2,3,3) valid-time conv3d layers collapsing T=3 -> 1."""

    features: int

    @nn.compact
    def __call__(self, x):  # (B, T=3, H, W, C)
        from ..models.layers import Conv3D

        x = Conv3D(self.features, (2, 3, 3), (1, 1, 1), (0, 1, 1), name="c0")(x)
        x = Conv3D(self.features, (2, 3, 3), (1, 1, 1), (0, 1, 1), name="c1")(x)
        return x[:, 0]  # (B, H, W, C)


class TemporalDiscriminator(nn.Module):
    patch_size: int

    @nn.compact
    def __call__(self, f0, f1, f2):
        x = jnp.stack([f0, f1, f2], axis=1)
        x = _Conv3DPair(64, name="feature_3d")(x)
        f = _ConvLadder(bn=False, name="features")(x)
        return _Classifier(name="classifier")(f.reshape(f.shape[0], -1))


class FIDiscriminator(nn.Module):
    patch_size: int

    @nn.compact
    def __call__(self, f0, f1):
        f = _ConvLadder(name="features")(jnp.concatenate([f0, f1], axis=-1))
        return _Classifier(name="classifier")(f.reshape(f.shape[0], -1))


class FICondDiscriminator(nn.Module):
    patch_size: int

    @nn.compact
    def __call__(self, f0, f1, f2):
        x = jnp.stack([f0, f1, f2], axis=1)
        x = _Conv3DPair(8, name="feature_3d")(x)
        f = _ConvLadder(base=8, name="features")(x)
        return _Classifier(name="classifier")(f.reshape(f.shape[0], -1))


class STDiscriminator(nn.Module):
    """Spatio-temporal two-stream (discriminator.py:208-263): spatial ladder
    on the frame, temporal ladder on (f1-f0, f1-f2) diffs, concat, head."""

    patch_size: int

    @nn.compact
    def __call__(self, f0, f1, f2):
        fs = _ConvLadder(base=8, name="s_features")(f1)
        ft = _ConvLadder(base=8, name="t_features")(
            jnp.concatenate([f1 - f0, f1 - f2], axis=-1)
        )
        flat = jnp.concatenate(
            [fs.reshape(fs.shape[0], -1), ft.reshape(fs.shape[0], -1)], axis=-1
        )
        return _Classifier(name="classifier")(flat)


def build_discriminator(gan_type: str, patch_size: int) -> nn.Module:
    """Mirror of Adversarial.__init__'s selection (adversarial.py:70-84)."""
    if gan_type == "T_WGAN_GP":
        return TemporalDiscriminator(patch_size)
    if gan_type == "FI_GAN":
        return FIDiscriminator(patch_size)
    if gan_type == "FI_Cond_GAN":
        return FICondDiscriminator(patch_size)
    if gan_type == "STGAN":
        return STDiscriminator(patch_size)
    return Discriminator(patch_size, gan_type)
