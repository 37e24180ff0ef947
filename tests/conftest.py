"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md section 4's plan: deterministic array-level unit tests plus
multi-chip sharding tests on fake devices — real TPU hardware is exercised
separately by bench.py / the driver.

Implementation note: this image's sitecustomize registers the axon TPU PJRT
plugin and programmatically sets ``jax_platforms="axon,cpu"``, which overrides
the ``JAX_PLATFORMS`` env var. We therefore force the platform via
``jax.config.update`` immediately after import, before any backend initialises;
this also makes ``jax_num_cpu_devices`` effective (it must be set before first
backend use).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: jit compiles dominate suite runtime on the
# 1-core sandbox (a tiny train-step compile is minutes); cache entries make
# re-runs (CI, judges, local iteration) start warm.
_cache_dir = os.environ.get("DEEPBEDMAP_JAX_CACHE", "/tmp/deepbedmap_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, "expected 8 virtual CPU devices"
    return devices
