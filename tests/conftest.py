"""Test config: force an 8-device CPU mesh before JAX initialises.

Mirrors the SURVEY.md §4 plan — multi-chip behaviour is tested on a faked
8-device CPU backend (XLA host platform), kernels against pure-jnp oracles.

The machine's sitecustomize pins JAX_PLATFORMS to the TPU plugin, so the env
var alone is not enough: we also flip the jax config knob, which wins over
the env var as long as no backend has been initialised yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: model-sized jit compiles dominate test time;
# repeat runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
