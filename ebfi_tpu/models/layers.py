"""Shared building blocks: conv layers, 3D convs, initializers.

Initializer parity with the reference:
- `initialize_weights(..., scale=0.1)` (models/model_misc/model_util.py:16-37)
  = kaiming-normal fan-in (gain sqrt(2)) with std scaled by 0.1, zero bias.
- The 3D encoder uses kaiming-normal fan-out (resnet_3D.py:279-291).
- Untouched torch modules keep torch's default Conv init: kaiming-uniform
  with a=sqrt(5) -> U(+-1/sqrt(fan_in)) for both kernel and bias.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

Dtype = Any


def kaiming_in_init(scale: float = 0.1):
    """Kaiming-normal fan-in times `scale` (model_util.py:16-27)."""
    return nn.initializers.variance_scaling(2.0 * scale * scale, "fan_in", "normal")


def kaiming_out_init():
    """Kaiming-normal fan-out, relu gain (resnet_3D.py:279-285)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_default_kernel_init():
    """torch Conv default: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    """torch Conv default bias: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def activation_fn(name: Optional[str]) -> Optional[Callable]:
    """Activations by their reference names (submodules.py:176-180)."""
    if name is None:
        return None
    table = {
        "ReLU": nn.relu,
        "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "Sigmoid": nn.sigmoid,
        "Tanh": jnp.tanh,
    }
    if name not in table:
        raise ValueError(f"Unknown activation {name!r}")
    return table[name]


class ConvLayer(nn.Module):
    """Conv2d + optional norm + activation (submodules.py:159-201).

    NHWC; `padding` is symmetric zeros like torch Conv2d.  norm in
    {None, 'BN', 'IN'}; BN uses bias-free conv like the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    activation: Optional[str] = "ReLU"
    norm: Optional[str] = None
    kernel_init: Callable = kaiming_in_init(0.1)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.norm != "BN"
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)
        if self.norm == "BN":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(y)
        elif self.norm == "IN":
            # InstanceNorm == GroupNorm with one group per channel.
            y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=self.dtype)(y)
        act = activation_fn(self.activation)
        return act(y) if act is not None else y


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding: Tuple[int, int, int] = (0, 0, 0),
    lhs_dilation: Tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """3D convolution, NDHWC <- (B, T, H, W, C) with DHWIO kernel.

    TPU-first lowering: the detail branch's temporal extent is tiny (T=2),
    where XLA's native conv3d tiles poorly.  Decompose over the kd temporal
    taps into batched 2D convs (temporal axis folded into batch) — exactly
    equivalent, runs on the MXU's well-tuned 2D conv path.  Temporal
    padding may be asymmetric (`padding[0]` as (lo, hi) pair or int).
    """
    B, T, H, W, C = x.shape
    kd = kernel.shape[0]
    sd, sh, sw = stride
    pd = padding[0] if isinstance(padding[0], (tuple, list)) else (padding[0], padding[0])
    ph = padding[1] if isinstance(padding[1], (tuple, list)) else (padding[1], padding[1])
    pw = padding[2] if isinstance(padding[2], (tuple, list)) else (padding[2], padding[2])
    ld_d, ld_h, ld_w = lhs_dilation

    if ld_d != 1:
        # temporal input dilation unused by the model family; fall back
        return lax.conv_general_dilated(
            x, kernel, stride, [pd, ph, pw],
            lhs_dilation=lhs_dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    if pd != (0, 0):
        x = jnp.pad(x, ((0, 0), pd, (0, 0), (0, 0), (0, 0)))
        T = T + pd[0] + pd[1]
    t_out = (T - kd) // sd + 1

    out = None
    for k in range(kd):
        xs = x[:, k : k + (t_out - 1) * sd + 1 : sd]  # (B, t_out, H, W, C)
        flat = xs.reshape(B * t_out, H, W, C)
        y = lax.conv_general_dilated(
            flat, kernel[k], (sh, sw), [ph, pw],
            lhs_dilation=(ld_h, ld_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    return out.reshape(B, t_out, *out.shape[1:])


class Conv3D(nn.Module):
    """Plain 3D conv (torch Conv3d semantics), NDHWC."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bias: bool = True
    kernel_init: Callable = torch_default_kernel_init()
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        kshape = (*self.kernel_size, Cin, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        y = conv3d(x, kernel, self.stride, self.padding)
        if self.use_bias:
            fan_in = Cin * int(np.prod(self.kernel_size))
            binit = self.bias_init or torch_default_bias_init(fan_in)
            y = y + self.param("bias", binit, (self.features,))
        return y


class ConvTranspose3D(nn.Module):
    """torch ConvTranspose3d semantics: out = (in-1)*s - 2p + k.

    Implemented as input-dilated conv with spatially flipped kernel
    (the exact transpose of the forward conv), NDHWC.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    kernel_init: Callable = torch_default_kernel_init()

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        k = self.kernel_size
        # Stored as (kd, kh, kw, Cout, Cin): fan_in for torch's default init
        # on ConvTranspose is Cin * prod(k) (weight shape (Cin, Cout, *k)).
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_out", "uniform"
            ),  # fan over Cin axis == last
            (*k, self.features, Cin),
        )
        flipped = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)  # DHW,I=Cin,O
        pads = [(kk - 1 - p, kk - 1 - p) for kk, p in zip(k, self.padding)]
        y = conv3d(
            x, flipped, stride=(1, 1, 1), padding=pads, lhs_dilation=self.stride
        )
        fan_in = Cin * int(np.prod(k))
        y = y + self.param("bias", torch_default_bias_init(fan_in), (self.features,))
        return y


class SEGating(nn.Module):
    """FLAVR-style squeeze-excite gate (resnet_3D.py:89-105): global avg
    pool -> 1x1x1 conv -> sigmoid -> scale."""

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        pooled = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        gate = Conv3D(x.shape[-1], (1, 1, 1))(pooled)
        return x * nn.sigmoid(gate)
