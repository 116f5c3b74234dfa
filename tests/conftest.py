"""Test harness configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that
multi-chip sharding tests (mesh/pjit/shard_map) run anywhere, mirroring the
strategy SURVEY.md §4 prescribes for multi-device coverage the reference
lacks.  Must run before the first ``import jax`` in any test module.
"""

import os

# Hard override: the session environment presets JAX_PLATFORMS=axon (real TPU
# tunnel) and its sitecustomize re-forces it via jax.config at interpreter
# start — so both the env var AND the config entry must be overridden here,
# before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
