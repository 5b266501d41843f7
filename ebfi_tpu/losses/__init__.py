"""Losses & metrics.

Training losses are pure-JAX (jit/grad-able); eval metrics replicate the
reference's skimage/LPIPS semantics (loss/restore.py, loss/__init__.py:1-4).
"""
from .restore import (
    laplacian_loss,
    census_loss,
    charbonnier_loss,
    mse_loss,
    l1_loss,
    psnr_metric,
    ssim_metric,
)
from .lpips import LPIPS, load_lpips_params
from .adversarial import AdversarialLoss, AdvState
from .flow import EventWarping, averaged_iwe, deblur_events
from .reconstruction import BrightnessConstancy

__all__ = [
    "AdversarialLoss",
    "AdvState",
    "EventWarping",
    "averaged_iwe",
    "deblur_events",
    "BrightnessConstancy",
    "laplacian_loss",
    "census_loss",
    "charbonnier_loss",
    "mse_loss",
    "l1_loss",
    "psnr_metric",
    "ssim_metric",
    "LPIPS",
    "load_lpips_params",
]
