"""Test configuration: force JAX onto a virtual 8-device CPU mesh so unit
tests are fast, deterministic, and exercise the multi-chip sharding paths
without TPU hardware.  Runs before jax initializes a backend.

Set JSMPEG_TPU_TESTS=1 to run the suite against the real device instead.
"""

import os

if not os.environ.get('JSMPEG_TPU_TESTS'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
