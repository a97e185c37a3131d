"""Test env: force the CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (the real chip is reserved for bench.py).

Note: in this environment the axon TPU plugin ignores a JAX_PLATFORMS env var
set in-process, so the backend is forced via jax.config instead.
"""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
