"""Test harness: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding paths are exercised on a virtual mesh per SURVEY.md §4
(the reference ships no test suite at all; this suite is designed fresh).
"""

import os

# Must run before the first backend initialization. Note: this image's
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon at interpreter boot,
# so plain env-var setdefault is too late — use jax.config.update instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
