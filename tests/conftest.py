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
# The env-var route (JAX_COMPILATION_CACHE_DIR) is ignored on this host
# (like JAX_PLATFORMS — see CLAUDE.md); the config API works.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Fast tier: `pytest -m "not slow"` skips the heavyweight end-to-end /
# interpreter-mode modules (~80% of suite wall time on this 1-core host).
_SLOW_MODULES = {
    "test_parallel_e2e",
    "test_loki_jax_segmentation",
    "test_full_haul_e2e",
    "test_threshold_device",
    "test_train_loop",
    "test_attic_kernels",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
