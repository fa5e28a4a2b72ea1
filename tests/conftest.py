"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so that multi-chip sharding
logic (shard_map/psum over a Mesh) is exercised without TPU hardware,
per the standard JAX testing recipe.

This environment pins JAX_PLATFORMS=axon (a tunneled TPU) via a
sitecustomize that runs before any test code, so the env var alone is
not enough -- we also override the jax config, which wins as long as no
backend has been initialized yet (conftest is imported before any test
imports jax arrays).
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
