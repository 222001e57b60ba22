"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md section 4 item 7:
the reference has no distributed tests; we do better).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax and registers the TPU (axon)
# backend before this conftest runs, so the env var alone is too late —
# force the platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TEST_DATA_DIR = pathlib.Path(__file__).parent / "data"
# Read-only fixtures from the reference repo (labels/hed/wav only, no code).
REFERENCE_DATA_DIR = pathlib.Path("/root/reference/tests/data")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def reference_data_dir():
    if not REFERENCE_DATA_DIR.exists():
        pytest.skip("reference fixture data not available")
    return REFERENCE_DATA_DIR
