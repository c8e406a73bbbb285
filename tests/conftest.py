"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

The framework itself is dtype-polymorphic (float32 on real TPU). Tests run in
float64 on CPU so kernels can be validated against NumPy/SciPy oracles at
tight tolerances, and multi-chip sharding is exercised on 8 virtual devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize may have imported jax already (latching JAX_PLATFORMS=axon),
# so set the config key directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: do NOT enable the persistent compilation cache here — deserializing
# cached executables on the forced-multi-device CPU backend segfaults
# (observed in jax compilation_cache.get_executable_and_time during the
# suite). Compile time is paid per run instead.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
