"""Test configuration: force an 8-virtual-device CPU platform.

Tests run against the CPU backend with 8 virtual devices so that sharding
and fleet paths are exercised without TPU hardware.  Pallas kernels detect
the CPU backend and fall back to interpret mode / pure-JAX implementations.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, so env vars
# written here land AFTER jax's config already sampled the environment —
# JAX_PLATFORMS and JAX_COMPILATION_CACHE_DIR set via os.environ are
# silently ignored.  Everything must go through the config API.
jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: XLA compiles are the dominant test cost on
# the single-core CPU host; cache them across runs.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
