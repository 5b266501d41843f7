"""Model family: TPU-native reimplementation of the reference EVFIAutoEx.

All modules are flax.linen with NHWC internals (TPU conv layout), stacked
`nn.scan` control stages, and on-device blurriness maps — no CPU round-trips
inside forward (reference: models/Ours/model_singleframe.py).
"""
from .layers import ConvLayer, kaiming_in_init, torch_default_kernel_init
from .exposure import ExposureDecision
from .control import ResidualControl
from .modification import Modification
from .unet3d import UNet3d18
from .evfi import EVFIAutoEx

__all__ = [
    "ConvLayer",
    "ExposureDecision",
    "ResidualControl",
    "Modification",
    "UNet3d18",
    "EVFIAutoEx",
    "kaiming_in_init",
    "torch_default_kernel_init",
]
