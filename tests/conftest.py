"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding tests run against
XLA's host-platform device virtualization instead.  Must be set before JAX
initializes, hence module import order matters (pytest loads conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from rust_raytrace_tpu.scene import reference_asset


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "needs_teapot: requires the reference teapot OBJ asset")


def pytest_collection_modifyitems(config, items):
    if reference_asset("raytrace", "teapot_tri.obj") is None:
        skip = pytest.mark.skip(reason="reference teapot_tri.obj not available")
        for item in items:
            if "needs_teapot" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
