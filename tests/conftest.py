"""Test configuration: force a virtual 8-device CPU mesh.

Correctness tests run on CPU (fast, deterministic, no TPU needed) with 8
virtual devices so sharding/pjit paths are exercised exactly as they would
be on an 8-chip slice. The benchmark (bench.py) runs on real TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
TEST_DATA = REFERENCE_ROOT / "test_data"
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def test_data_dir():
    if not TEST_DATA.is_dir():
        pytest.skip("reference test_data not available")
    return TEST_DATA


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


def require_fixture(path: pathlib.Path):
    if not path.exists():
        pytest.skip(f"fixture {path} not available")
    return path
