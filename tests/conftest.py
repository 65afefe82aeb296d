import os
import sys

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware.  Must be set before importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The container's sitecustomize imports jax at interpreter startup (to
# register the axon TPU plugin), so env vars above are too late for the
# already-cached config — override via jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

# GV diagram tables: use the reference data files (a data contract, not code)
# when present; self-generated tables take precedence via FDTPU_GV_TABLES.
_REF_TABLES = "/root/reference/src/frontend/GV_diagrams"
if "FDTPU_GV_TABLES" not in os.environ and os.path.isdir(_REF_TABLES):
    os.environ["FDTPU_GV_TABLES"] = _REF_TABLES


@pytest.fixture(autouse=True)
def _fresh_uid():
    """Reset the graph uid counter between tests for reproducible ids."""
    from feynmandiagram_tpu.computational_graph import uid_reset
    uid_reset()
    yield
