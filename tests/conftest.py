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

import jax

# The axon TPU plugin (sitecustomize) force-selects itself by writing
# jax_platforms="axon,cpu" at interpreter boot, overriding the env var.
# Re-select CPU before any backend initializes so tests really run on the
# virtual 8-device CPU mesh (and compiles stay local, not tunneled).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles dominate test wall-clock on this
# 1-CPU box.  The cache makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
