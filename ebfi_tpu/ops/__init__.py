"""Compute kernels for the EBFI-TPU framework.

TPU-native replacements for the reference's CUDA extensions and CPU/cv2
round-trips:

- :func:`kernel_conv2d` — FAC filter-adaptive convolution
  (reference: models/FAC/kernelconv2d/KernelConv2D_kernel.cu).
- :func:`dcn_v2` / :func:`dcn_v2_conv` — modulated deformable convolution
  (reference: models/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu).
- :func:`events_to_stack` — per-polarity temporal-bin event rasterizer
  (reference: dataloader/encodings.py:307-350).
- :func:`dark_channel`, :func:`laplacian_response` — blurriness maps computed
  on-device (reference: myutils/utils.py:15-49 round-trips via cv2 on CPU).
"""
import os

import jax

from .kernel_conv2d import kernel_conv2d, kernel_conv2d_raw


def kernel_conv2d_auto(x, kernel, kernel_size: int):
    """FAC with the framework's tap-major bank layout: fused Pallas kernel
    on TPU backends, XLA shift formulation elsewhere (or with
    EBFI_DISABLE_PALLAS=1)."""
    if (
        jax.default_backend() in ("tpu", "axon")
        and not os.environ.get("EBFI_DISABLE_PALLAS")
    ):
        from .pallas import kernel_conv2d_pallas

        return kernel_conv2d_pallas(x, kernel, kernel_size)
    return kernel_conv2d(x, kernel, kernel_size, layout="tap_major")
from .dcn_v2 import dcn_v2_conv, dcn_v2_im2col
from .event_encoding import events_to_stack, events_to_voxel
from .image_ops import (
    dark_channel,
    laplacian_response,
    pixel_shuffle,
    replication_pad_2d,
    reflection_pad_2d,
    pad_amounts_to_multiple,
    zero_pad_to_multiple,
    center_crop,
)

__all__ = [
    "kernel_conv2d",
    "kernel_conv2d_raw",
    "kernel_conv2d_auto",
    "dcn_v2_conv",
    "dcn_v2_im2col",
    "events_to_stack",
    "events_to_voxel",
    "dark_channel",
    "laplacian_response",
    "pixel_shuffle",
    "replication_pad_2d",
    "reflection_pad_2d",
    "pad_amounts_to_multiple",
    "zero_pad_to_multiple",
    "center_crop",
]
