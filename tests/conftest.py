"""Test env: force CPU with a virtual 8-device mesh so sharding tests run
anywhere (the real-TPU paths are exercised by bench.py / the driver).

XLA_FLAGS must be set before the CPU backend initializes; jax_platforms must
be forced via jax.config because the axon TPU tunnel's sitecustomize sets the
platform at interpreter startup.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """`hardware` and `mesh_subprocess` imply `slow`, so the fast tier is
    exactly one expression: pytest -m "not slow" (~2-3 min); the full gate
    is a plain `pytest tests/` (~12-15 min, includes the real-chip check)."""
    slow = pytest.mark.slow
    for item in items:
        if "hardware" in item.keywords or "mesh_subprocess" in item.keywords:
            item.add_marker(slow)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
