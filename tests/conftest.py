"""Test harness: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Must set env vars before the first `import jax` anywhere in the test process
(SURVEY §4 test strategy item 4).
"""

import os

# Force CPU: the surrounding environment may export JAX_PLATFORMS=axon (the
# single-TPU tunnel); tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
