import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. Must be set before JAX backends initialize.
# The axon site hook force-selects the tunneled TPU via
# jax.config.update("jax_platforms", "axon,cpu"), so the env var alone is not
# enough — override the config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import pytest

GOLDEN = pathlib.Path("/root/reference/AUTOTEST/sha256.zpaq")


@pytest.fixture(scope="session")
def golden_bytes():
    if not GOLDEN.exists():
        pytest.skip("golden archive fixture not available")
    return GOLDEN.read_bytes()
