"""Test harness: force an 8-device virtual CPU mesh.

The test pyramid (SURVEY §4) runs entirely on CPU so it is fast and
deterministic; the sharding tests use the 8 virtual devices to stand in for
a multi-chip TPU slice. XLA_FLAGS must be set before the CPU client is
created; jax_platforms must be forced via config because the axon TPU
plugin's sitecustomize overrides the JAX_PLATFORMS env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
