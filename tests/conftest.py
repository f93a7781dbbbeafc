"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding/pjit paths are
validated on a virtual 8-device CPU backend.

Note: this environment's sitecustomize pre-imports jax and prepends the
axon TPU platform to JAX_PLATFORMS, so the env-var route is ineffective;
``jax.config.update`` after import (but before backend init) wins.
"""

import os
import sys

# repo root on sys.path so tests importing top-level harnesses (bench,
# bench_accuracy, __graft_entry__) work regardless of pytest's invocation
# directory (``pytest tests/`` from elsewhere does not add the rootdir)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]
