"""Test harness config: run everything on a virtual 8-device CPU mesh.

The CI/dev loop must not require TPU hardware (SURVEY.md §4): we force the
CPU backend with 8 virtual devices so sharding tests exercise real
multi-device code paths, and Pallas kernels run in interpret mode.
"""

import os

# Must be set before the first backend initialisation.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
