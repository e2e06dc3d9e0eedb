"""Test configuration: force LOCAL CPU JAX with a virtual 8-device mesh.

Multi-chip sharding (parallel/) is validated on 8 virtual CPU devices via
--xla_force_host_platform_device_count, the JAX-native way to test
mesh/pjit code without TPU pod hardware (SURVEY.md §4).

This environment auto-registers a remote-TPU PJRT proxy backend through a
sitecustomize hook that ignores the JAX_PLATFORMS env var — every test op
would cross a network tunnel to the shared bench chip (~100x slower). The
hook imports jax but backends initialize lazily, so overriding
jax_platforms here (before any backend use) selects the local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
