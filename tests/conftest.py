"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices (the JAX-idiomatic
"fake backend" — see SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin on this host ignores JAX_PLATFORMS; force the CPU
# backend through the config API (must run before any backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip XLA recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
