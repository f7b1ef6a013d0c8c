"""Test config: run everything on a virtual 8-device CPU mesh.

Must set flags before JAX initializes its backends. The ambient environment
may pin JAX_PLATFORMS (e.g. to a TPU platform), so we override — set
LIVES_TPU_TEST_TPU=1 to run the suite against the real device instead
(needed for tests/test_pallas.py, which skips on cpu).
"""

import os

if os.environ.get("LIVES_TPU_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("LIVES_TPU_TEST_TPU") != "1":
    # the env var alone is not enough: the ambient TPU platform plugin
    # (axon) overrides JAX_PLATFORMS, so pin via the config API too
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
