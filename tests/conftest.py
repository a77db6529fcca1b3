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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(17)
