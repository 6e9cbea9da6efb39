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

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
