"""Inference: engine (jit/scan interpolator) and the CLI harness."""
from .engine import InferenceEngine

__all__ = ["InferenceEngine"]
