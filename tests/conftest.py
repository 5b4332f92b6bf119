"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by asking XLA for 8
host-platform devices (SURVEY.md section 4 'Implication for the new build').
Must run before jax initializes its backends, hence env vars at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin forces jax_platforms via jax.config at
# interpreter startup (sitecustomize), so the env var alone is not enough —
# override the config knob back to cpu-only.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
