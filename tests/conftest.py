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

# Persistent XLA compilation cache: the suite is compile-dominated (the
# fused chains take 10-60 s each to build on CPU) and xdist workers
# re-compile the same programs — sharing one on-disk cache deduplicates
# them within a run and makes re-runs start warm (measured: the batched
# FM chain drops 53.9 -> 10.9 s across processes).  Safe concurrent use
# (atomic renames, content-hashed keys); .jax_cache/ is gitignored.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
# subprocess-spawned drives (CLI golden captures, make_capture,
# distributed 2-process) read the env var and share the same cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
