"""Reusable NN block library.

Flax counterparts of the reference's model-misc toolbox
(models/model_misc/submodules.py): residual blocks, recurrent conv cells
(ConvLSTM :460-519, ConvGRU :522-560), up/transposed conv layers
(:204-260), self-attention (:80-112), MLP (:67-77), 1D conv (:115-156),
plus the UNet family the reference vendors as library code
(models/model_misc/unet.py: BaseUNet/UNetFlow-style encoder-decoder) in a
single parameterized module.

Everything is NHWC and jit/scan-friendly (recurrent cells expose
(carry, x) -> (carry, y) for `lax.scan`).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvLayer, activation_fn, kaiming_in_init, torch_default_kernel_init


class ResidualBlock(nn.Module):
    """conv-act-conv + skip (submodules.py ResidualBlock)."""

    features: int
    activation: str = "ReLU"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        h = ConvLayer(self.features, 3, 1, 1, self.activation, self.norm, name="conv1")(x)
        h = ConvLayer(self.features, 3, 1, 1, None, self.norm, name="conv2")(h)
        return act(h + x)


class TransposedConvLayer(nn.Module):
    """2x upsampling transposed conv (submodules.py:204-231)."""

    features: int
    kernel_size: int = 4
    activation: Optional[str] = "ReLU"

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(2, 2),
            padding="SAME",
            kernel_init=torch_default_kernel_init(),
        )(x)
        act = activation_fn(self.activation)
        return act(y) if act else y


class UpsampleConvLayer(nn.Module):
    """Bilinear upsample + conv — checkerboard-free upsampling
    (submodules.py:234-260)."""

    features: int
    kernel_size: int = 3
    scale: int = 2
    activation: Optional[str] = "ReLU"

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        up = jax.image.resize(x, (B, H * self.scale, W * self.scale, C), "bilinear")
        p = self.kernel_size // 2
        y = nn.Conv(
            self.features, (self.kernel_size,) * 2, padding=[(p, p)] * 2,
            kernel_init=torch_default_kernel_init(),
        )(up)
        act = activation_fn(self.activation)
        return act(y) if act else y


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM (submodules.py:460-519)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        p = self.kernel_size // 2
        gates = nn.Conv(
            4 * self.features, (self.kernel_size,) * 2, padding=[(p, p)] * 2,
            kernel_init=torch_default_kernel_init(), name="gates",
        )(jnp.concatenate([x, h], axis=-1))
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    @staticmethod
    def init_carry(batch, height, width, features, dtype=jnp.float32):
        z = jnp.zeros((batch, height, width, features), dtype)
        return (z, z)


class ConvGRUCell(nn.Module):
    """Convolutional GRU (submodules.py:522-560)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        p = self.kernel_size // 2
        conv = lambda name, inp: nn.Conv(
            self.features, (self.kernel_size,) * 2, padding=[(p, p)] * 2,
            kernel_init=nn.initializers.orthogonal(), name=name,
        )(inp)
        xh = jnp.concatenate([x, h], axis=-1)
        update = nn.sigmoid(conv("update", xh))
        reset = nn.sigmoid(conv("reset", xh))
        out = jnp.tanh(conv("out", jnp.concatenate([x, h * reset], axis=-1)))
        h_new = h * (1.0 - update) + out * update
        return h_new, h_new

    @staticmethod
    def init_carry(batch, height, width, features, dtype=jnp.float32):
        return jnp.zeros((batch, height, width, features), dtype)


class RecurrentConvLayer(nn.Module):
    """Downsampling conv + recurrent cell (submodules.py:263-306)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    recurrent_block_type: str = "convlstm"
    activation: str = "ReLU"
    norm: Optional[str] = None

    def setup(self):
        self.conv = ConvLayer(
            self.features, self.kernel_size, self.stride,
            self.kernel_size // 2, self.activation, self.norm, name="conv",
        )
        if self.recurrent_block_type == "convlstm":
            self.cell = ConvLSTMCell(self.features, name="cell")
        else:
            self.cell = ConvGRUCell(self.features, name="cell")

    def __call__(self, carry, x):
        y = self.conv(x)
        return self.cell(carry, y)


class SelfAttention(nn.Module):
    """Offset self-attention over point/token sets (submodules.py:80-112)."""

    channels: int

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        C = self.channels
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, kernel_init=torch_default_kernel_init(), name=name
        )
        qk = dense(C // 4, "qk_proj", bias=False)  # shared Q/K weights like the ref
        q = qk(x)
        k = qk(x)
        v = dense(C, "v_proj")(x)
        energy = jnp.einsum("bnc,bmc->bnm", q, k)
        attn = jax.nn.softmax(energy, axis=-1)
        attn = attn / (1e-9 + attn.sum(axis=1, keepdims=True))
        r = jnp.einsum("bmc,bnm->bnc", v, attn)
        r = dense(C, "trans")(x - r)
        mean = jnp.mean(r, axis=(0, 1), keepdims=True)
        var = jnp.var(r, axis=(0, 1), keepdims=True)
        r = nn.relu((r - mean) / jnp.sqrt(var + 1e-5))
        return x + r


class MLP(nn.Module):
    """ReLU MLP (submodules.py:67-77)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, name=f"layer{self.num_layers - 1}")(x)


class ConvLayer1D(nn.Module):
    """1D conv + optional norm + activation (submodules.py:115-156)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    activation: Optional[str] = "ReLU"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        y = nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            use_bias=self.norm != "BN",
            kernel_init=torch_default_kernel_init(),
        )(x)
        if self.norm == "BN":
            mean = jnp.mean(y, axis=(0, 1), keepdims=True)
            var = jnp.var(y, axis=(0, 1), keepdims=True)
            y = (y - mean) / jnp.sqrt(var + 1e-5)
        act = activation_fn(self.activation)
        return act(y) if act else y


class UNet(nn.Module):
    """Parameterized encoder-decoder with skip connections — the library
    UNet family (models/model_misc/unet.py BaseUNet/MultiResUNet shapes):
    `num_encoders` stride-2 stages, residual bottleneck, transposed- or
    upsample-conv decoder, skip sum or concat."""

    base_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    out_channels: int = 1
    skip_type: str = "sum"          # 'sum' | 'concat'
    upsample_type: str = "transpose"  # 'transpose' | 'upsample'
    activation: str = "ReLU"
    final_activation: Optional[str] = "Sigmoid"

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        h = ConvLayer(self.base_channels, 5, 1, 2, self.activation, name="head")(x)
        skips = []
        ch = self.base_channels
        for i in range(self.num_encoders):
            skips.append(h)
            ch *= 2
            h = ConvLayer(ch, 5, 2, 2, self.activation, name=f"enc{i}")(h)
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(ch, self.activation, name=f"res{i}")(h)
        for i in range(self.num_encoders):
            ch //= 2
            if self.upsample_type == "transpose":
                h = TransposedConvLayer(ch, 4, self.activation, name=f"dec{i}")(h)
            else:
                h = UpsampleConvLayer(ch, 3, 2, self.activation, name=f"dec{i}")(h)
            skip = skips.pop()
            h = h + skip if self.skip_type == "sum" else jnp.concatenate([h, skip], -1)
        out = ConvLayer(self.out_channels, 3, 1, 1, None, name="pred")(h)
        fact = activation_fn(self.final_activation)
        return fact(out) if fact else out
