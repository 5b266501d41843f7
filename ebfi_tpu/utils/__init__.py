"""Logging, metrics, timers, misc utilities."""
from .logger import setup_logging, YamlResultLogger
from .metrics import MetricTracker
from .timers import Timer, DeviceTimer, timing_report

__all__ = [
    "setup_logging",
    "YamlResultLogger",
    "MetricTracker",
    "Timer",
    "DeviceTimer",
    "timing_report",
]
