"""Test configuration.

Forces JAX onto 8 virtual CPU devices so mesh/pjit/shard_map tests run
without TPU hardware (the standard JAX trick; SURVEY.md section 4).  Must
run before jax is imported anywhere in the test process.
"""

import os

# Force, not setdefault: the environment presets JAX_PLATFORMS to the real
# TPU backend (a sitecustomize hook registers it at interpreter boot), and
# unit tests must not dispatch per-op over the device tunnel.  The env var
# alone is not enough — the boot hook wins — so also override the live jax
# config before any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persist XLA compiles across test runs: the suite's wall time is dominated
# by 3D-conv train-step compiles, and the persistent cache serves CPU
# executables too (measured 1.6x on tests/test_train.py warm vs cold).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
