"""Test configuration: force a virtual 8-device CPU mesh.

Correctness tests run on CPU (fast, deterministic, no TPU needed) with 8
virtual devices so sharding/pjit paths are exercised exactly as they would
be on an 8-chip slice. The benchmark (bench.py) runs on real TPU hardware.
"""

import os

# XLA flags must be set before the CPU client is created.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin registers itself via sitecustomize and pre-sets
# JAX_PLATFORMS=axon in the environment, so plain env overrides are
# ignored; the config API still wins. Tests run on the virtual 8-device
# CPU mesh; only bench.py uses the real chip.
jax.config.update("jax_platforms", "cpu")

from libnyquist_tpu.runtime.jaxcfg import default_cache_dir

jax.config.update("jax_compilation_cache_dir", default_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
