"""Test env: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes its backends, hence the env mutation at
module import (pytest imports conftest before test modules).
"""

import os

# The session presets JAX_PLATFORMS=axon and a sitecustomize that imports jax
# at interpreter start, so plain env mutation here is too late -- use the
# dynamic config API (backends are still uninitialized at conftest time).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for the CPU suite: the wall-clock tail is
# jit-heavy eval/figure tests recompiling identical tiny-model programs on
# every run (measured ~37 min cold on this 1-core host).  Cache entries are
# keyed on backend + program, so a warm rerun skips straight to execution.
# COLDDIFF_NO_TEST_CACHE=1 opts out (e.g. when timing true compile cost).
if not os.environ.get("COLDDIFF_NO_TEST_CACHE"):
    _cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "colddiff", "xla-tests")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
