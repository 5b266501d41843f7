"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA twin in ebfi_tpu.ops used as the numerical
reference (and as the CPU/interpret fallback); parity is enforced by tests.
"""
from .fac import kernel_conv2d_pallas
from .control_stage import residual_control_stage_pallas

__all__ = ["kernel_conv2d_pallas", "residual_control_stage_pallas"]
