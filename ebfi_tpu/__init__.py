"""EBFI-TPU: TPU-native event-based blurry frame interpolation under blind exposure.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
CVPR-2023 "Event-based Blurry Frame Interpolation under Blind Exposure"
implementation (PyTorch + CUDA), redesigned TPU-first:

- ``ebfi_tpu.ops``      — compute kernels (filter-adaptive conv, modulated
  deformable conv, event scatter-binning, image ops) as fused XLA/Pallas
  programs with exact autodiff, replacing the reference's CUDA extensions.
- ``ebfi_tpu.models``   — flax.linen reimplementation of the EVFIAutoEx model
  family (NHWC internals, `lax.scan`-compiled control stages).
- ``ebfi_tpu.data``     — H5 ingest, windowing, host-side encoders and a
  device-prefetching input pipeline replacing torch DataLoader.
- ``ebfi_tpu.losses``   — Laplacian-pyramid, census, Charbonnier, PSNR/SSIM,
  LPIPS and adversarial losses in pure JAX.
- ``ebfi_tpu.train``    — pjit'd data-parallel trainer (psum over the ICI mesh),
  config system, checkpointing, logging.
- ``ebfi_tpu.infer``    — CLI-compatible inference harness.
- ``ebfi_tpu.parallel`` — device-mesh / sharding utilities.
"""

__version__ = "0.1.0"
