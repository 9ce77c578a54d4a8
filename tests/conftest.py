"""Test env setup: force CPU backend with 8 virtual devices.

SURVEY.md §4 item 4: the real pjit/mesh code paths (sharded replay,
psum, broadcast) run in CI on a virtual 8-device CPU mesh.

Note: this sandbox preloads jax via sitecustomize (axon TPU plugin), so
env vars alone are too late — we force the platform through
jax.config.update, which works because no backend has been initialized
yet at conftest time.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
# Exact-numerics bar: no matmul downcasts in tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on CPU backend"


@pytest.fixture
def key():
    return jax.random.key(0)
