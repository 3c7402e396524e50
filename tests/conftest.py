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
# NO persistent compilation cache for the CPU test backend.  XLA:CPU AOT
# executable serialization is broken in this environment: the compile
# target advertises pseudo-features the host rejects ("+prefer-no-scatter
# is not supported on the host machine"), so cache LOADS segfault in
# compilation_cache.get_executable_and_time and cache WRITES abort in
# put_executable_and_time (both observed under tests/).  Slow recompiles
# beat crashing test runs; the TPU cache (a different serialization path)
# stays enabled in bench.py/__graft_entry__.py.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
