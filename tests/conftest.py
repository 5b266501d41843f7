"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on `xla_force_host_platform_device_count=8`
CPU devices; the driver separately dry-runs the multichip path and benches on
real TPU hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
