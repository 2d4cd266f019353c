"""Test configuration: force an 8-device virtual CPU mesh.

This fixes the reference's "cannot test distributed without a cluster" gap
(SURVEY.md §4) — all sharding/pjit paths are exercised on host CPU devices.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: outer env points at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# Something in the environment pins jax_platforms to "axon,cpu" (the TPU
# tunnel) regardless of JAX_PLATFORMS — override through the config API.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip XLA compilation,
# critical on the single-core CI host.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() == 8, jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
