"""Test configuration: force an 8-virtual-device CPU platform.

Tests run against the CPU backend with 8 virtual devices so that sharding
and fleet paths are exercised without TPU hardware.  Pallas kernels detect
the CPU backend and fall back to interpret mode / pure-JAX implementations.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# Persistent compilation cache: XLA compiles are the dominant test cost on
# the single-core CPU host; cache them across runs.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_test_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force the
# CPU platform through the config API (verified effective).
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
