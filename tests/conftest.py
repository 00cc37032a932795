"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native answer to the reference's mp.spawn+gloo distributed
tests (reference: tests/distributed/utils.py:12-38): instead of forking
processes, XLA exposes 8 virtual CPU devices in one process and all
mesh/pjit/collective code paths run for real.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
