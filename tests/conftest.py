"""Test harness config: force an 8-device virtual CPU platform so sharding
tests run anywhere (SURVEY.md §4 'Multi-host without a cluster')."""

import os

# Force CPU even if the outer environment selects a TPU platform: unit
# tests compile many small programs and the remote-TPU compile latency
# would dominate; the bench and driver select TPU themselves. The axon
# sitecustomize force-sets jax_platforms via jax.config at interpreter
# start, so overriding the env var alone is not enough — override the
# config too (safe: the backend is initialized lazily, and nothing has
# touched it yet at conftest import time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
