"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax with the axon TPU platform
pinned; `jax.config.update` after import (but before first backend use) still
lets us switch to CPU, and XLA_FLAGS is read lazily at backend init, so the
8-device override below works (SURVEY.md 4: distributed tests on a fake mesh).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the tiny end-to-end train step takes minutes
# to compile on CPU; cache it across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/ccvpe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(17)
