"""Logging, metrics, timers, misc utilities."""
from .logger import setup_logging, YamlResultLogger
from .metrics import MetricTracker
from .timers import Timer, DeviceTimer, timing_report
from .misc import normalize_event_tensor, to_uint8_image, inf_loop, param_count

__all__ = [
    "setup_logging",
    "YamlResultLogger",
    "MetricTracker",
    "Timer",
    "DeviceTimer",
    "timing_report",
    "normalize_event_tensor",
    "to_uint8_image",
    "inf_loop",
    "param_count",
]
