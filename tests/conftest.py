"""Test configuration.

Reference parity: the reference tests run on the host (conftest.py there
re-execs MPI tests under mpiexec); here all tests run on a CPU-simulated
platform — including an 8-device virtual mesh for multi-chip tests
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), the TPU analog of
the reference's mpiexec-subprocess trick (SURVEY.md §4).
"""

import os

# NB: this image's sitecustomize registers the `axon` TPU-tunnel PJRT
# plugin in every interpreter and pins JAX_PLATFORMS=axon. Tests always
# run on host CPU with a virtual 8-device mesh (the TPU analog of the
# reference's mpiexec-on-localhost trick) unless explicitly overridden.
# XLA_FLAGS must be set before first backend use; jax.config.update
# overrides the plugin's platform pin.
if not os.environ.get('DEVITO_TPU_TEST_ON_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa
import pytest  # noqa


@pytest.fixture
def grid2d():
    from devito_tpu import Grid
    return Grid(shape=(16, 16), extent=(15., 15.))


@pytest.fixture
def grid3d():
    from devito_tpu import Grid
    return Grid(shape=(12, 12, 12), extent=(11., 11., 11.))


@pytest.fixture(autouse=True)
def clear_symbol_cache():
    yield
    import devito_tpu
    devito_tpu.clear_cache()
