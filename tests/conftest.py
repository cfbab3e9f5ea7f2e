"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX substitute for multi-chip testing without hardware
(SURVEY.md §4): all tests run on CPU with 8 virtual devices so sharding
logic is exercised exactly as it would be on a TPU slice.
"""

import os

# NOTE: this environment's sitecustomize imports jax and pins
# JAX_PLATFORMS to the TPU plugin before conftest runs, so the env var
# alone is not enough — the config must be updated post-import (backends
# initialize lazily, so this is still early enough).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8

# Persistent compilation cache: keyed by HLO hash, so stale-code hits are
# impossible and suite re-runs skip identical recompiles (single CPU core
# here; compile dominates the 12-min suite).
from pod_compare_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
