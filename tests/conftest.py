"""Test configuration.

Tests run on CPU with 8 faked XLA host devices so that mesh/sharding tests
work without TPU hardware (SURVEY.md §4 "Distributed tests without a
cluster").  Must be set before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU even when the environment pre-registers the axon TPU backend
# (this box's sitecustomize imports jax with JAX_PLATFORMS=axon before
# conftest runs, so the env var alone is latched too late — use the config
# API).  Unit tests must be fast and hardware-independent; set
# GANET_TEST_TPU=1 to run the suite against the real chip instead.
if os.environ.get("GANET_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

# Persistent compilation cache: full-model gradient compiles take minutes on
# this 2-core box; cache them across test runs.  Keyed per backend (entries
# written through the remote-TPU tunnel can carry a foreign host's CPU
# features — see ganet_tpu.utils.platform.enable_compile_cache).
_cache_dir = os.environ.get(
    "GANET_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.abspath(_cache_dir), jax.default_backend()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
