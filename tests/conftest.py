"""Test env: force the CPU backend with 8 virtual devices so every test —
including shard_map/all_to_all distributed paths — runs without a TPU
(SURVEY.md §4.2). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU sort kernels take 10-60s to compile; persist compilations across
# test runs (cache keyed on HLO, safe to share).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_urmap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# The environment's sitecustomize registers the axon TPU plugin and sets
# jax_platforms before conftest runs, so the env var alone doesn't win;
# re-point the config at CPU before the backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
