"""Test harness: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The surrounding environment pre-registers an `axon` TPU PJRT plugin via a
sitecustomize hook and exports JAX_PLATFORMS=axon — env vars set here are too
late. `jax.config.update` still works because no backend has been initialized
yet when conftest runs, so we force the platform through the config API
(SURVEY §4 test strategy item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()}"
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(42)
