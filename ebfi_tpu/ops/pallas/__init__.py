"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA twin in ebfi_tpu.ops used as the numerical
reference (and as the CPU/interpret fallback); parity is enforced by tests.
"""
from .fac import kernel_conv2d_pallas

__all__ = ["kernel_conv2d_pallas"]
