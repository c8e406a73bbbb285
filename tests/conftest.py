"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

The framework itself is dtype-polymorphic (float32 on real TPU). Tests run in
float64 on CPU so kernels can be validated against NumPy/SciPy oracles at
tight tolerances, and multi-chip sharding is exercised on 8 virtual devices.
"""
import os

# Raise the stack limit BEFORE jax creates its compile worker threads:
# XLA's CPU-backend compilation of the largest fused programs segfaulted
# mid-suite inside backend_compile (stack-overflow signature: crash site
# wanders between compile/serialize/deserialize of the same big programs,
# each passes in isolation). Threads inherit the limit active at creation.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 256 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (_want if _hard == resource.RLIM_INFINITY else min(_want, _hard), _hard),
        )
    except (ValueError, OSError):
        pass

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

# Persistent compilation cache: the jax<0.9 segfault when deserializing
# cached executables on the forced-multi-device CPU backend is gone on
# jax 0.9 (verified: two consecutive cached suite runs) — re-enabled; a
# warm cache cuts suite wall-clock by ~4x on a 2-CPU box.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/xmat_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full-suite run accumulates hundreds of live executables on the
    8-virtual-device CPU backend and eventually SEGFAULTS inside XLA's
    backend_compile on one of the largest programs (reproducible at the
    same test; the same test passes in isolation). Releasing compiled
    programs between modules keeps the process footprint bounded; the
    persistent on-disk cache makes re-tracing cheap.
    """
    yield
    jax.clear_caches()



