"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic can be
validated without TPU hardware (the driver separately dry-runs the multichip
path; bench.py runs on the real chip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin registers itself from sitecustomize at interpreter
# startup (before this file runs), which overrides JAX_PLATFORMS; force the
# platform back to CPU before any kernel dispatch so tests never go over
# the remote-TPU tunnel.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pathlib

import pytest

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def ref_fixture_dir():
    if not REFERENCE_TESTS.exists():
        pytest.skip("reference test fixtures not available")
    return REFERENCE_TESTS
