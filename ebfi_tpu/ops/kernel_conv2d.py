"""Filter-adaptive convolution (FAC / "KernelConv2D").

Per-pixel dynamic convolution: every output pixel is convolved with its own
K x K kernel, predicted by the network.  Reference semantics (CUDA):

    out[b, c, y, x] = sum_{ky, kx} in[b, c, y+ky, x+kx]
                       * kern[b, c*K*K + ky*K + kx, y, x]

with the input replication-padded by (K-1)//2 on each side
(reference: models/FAC/kernelconv2d/KernelConv2D_kernel.cu:25-53 forward,
KernelConv2D.py:77-87 module wrapper and padding).

TPU-first formulation
---------------------
Instead of one scalar thread per output element (the CUDA design), we express
the op as K*K statically-shifted elementwise multiply-accumulates over NHWC
arrays.  Each shift is a static slice of the padded input; XLA fuses the whole
accumulation into a handful of vectorized VPU loops, and autodiff through the
shifts yields exactly the CUDA backward kernels (scatter of kern*grad for the
input; shifted product for the kernel bank), cf.
KernelConv2D_kernel.cu:91-150.

Layout: NHWC.  The per-pixel kernel bank is (B, H, W, C*K*K) with the channel
index laid out as ``c*K*K + ky*K + kx`` to match the reference's kernel
prediction conv (models/Ours/model_singleframe.py:145,161-162).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kernel_conv2d_raw(
    x_pad: jax.Array, kernel: jax.Array, kernel_size: int, layout: str = "c_major"
) -> jax.Array:
    """Apply per-pixel kernels to an already-padded input.

    Mirrors the raw CUDA op (no padding inside): ``x_pad`` is
    (B, H+K-1, W+K-1, C) and ``kernel`` is (B, H, W, C*K*K); returns
    (B, H, W, C).

    layout: 'c_major' — bank channel = ``c*K*K + ky*K + kx`` (the torch
    op's order); 'tap_major' — ``(ky*K + kx)*C + c`` (the framework's
    canonical order: each tap is a contiguous lane slice, which both XLA
    and the Pallas kernel consume without a gather).
    """
    K = kernel_size
    B, Hp, Wp, C = x_pad.shape
    H, W = Hp - (K - 1), Wp - (K - 1)
    if kernel.shape != (B, H, W, C * K * K):
        raise ValueError(
            f"kernel shape {kernel.shape} incompatible with input {x_pad.shape} and K={K}"
        )
    out = jnp.zeros((B, H, W, C), dtype=jnp.promote_types(x_pad.dtype, kernel.dtype))
    if layout == "c_major":
        kern = kernel.reshape(B, H, W, C, K, K)
        taps = lambda ky, kx: kern[..., ky, kx]
    elif layout == "tap_major":
        taps = lambda ky, kx: kernel[..., (ky * K + kx) * C : (ky * K + kx + 1) * C]
    else:
        raise ValueError(f"unknown layout {layout!r}")
    for ky in range(K):
        for kx in range(K):
            out = out + x_pad[:, ky : ky + H, kx : kx + W, :] * taps(ky, kx)
    return out


def kernel_conv2d(
    x: jax.Array, kernel: jax.Array, kernel_size: int, layout: str = "c_major"
) -> jax.Array:
    """Filter-adaptive convolution with replication padding (module semantics).

    Args:
      x: (B, H, W, C) input features.
      kernel: (B, H, W, C*K*K) per-pixel kernel bank (see
        :func:`kernel_conv2d_raw` for the two channel layouts).
      kernel_size: odd K.

    Returns: (B, H, W, C).
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    p = (kernel_size - 1) // 2
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    return kernel_conv2d_raw(x_pad, kernel, kernel_size, layout)
