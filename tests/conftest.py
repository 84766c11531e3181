"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must configure before any test module touches jax.  Note: the session may
preset JAX_PLATFORMS=axon (real TPU); the env var alone does not override
the plugin, so we use jax.config directly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
