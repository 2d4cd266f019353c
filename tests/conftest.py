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


# ---------------------------------------------------------------------------
# fast / slow tiers: `pytest -m fast` is the quick green signal (~90 s warm
# on this 1-core host, measured); everything compile-heavy (beam decode,
# TrainLoop e2e, parity oracles, multi-process distributed) is `slow`.
# Marking is per-module so a new test lands in the right tier by file.
# ---------------------------------------------------------------------------
_FAST_MODULES = {
    "test_codec", "test_trie", "test_masks", "test_metrics", "test_rerank",
    "test_data", "test_io_utils", "test_subword", "test_native",
    "test_packed_store", "test_losses_extra", "test_index", "test_kmeans",
    "test_convert", "test_pallas_rerank", "test_checkpoint", "test_quantize",
    "test_bench_scale",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.fast if mod in _FAST_MODULES
                        else pytest.mark.slow)
