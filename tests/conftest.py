"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising all code paths in one process
(SURVEY.md §4): device-path tests run on XLA:CPU with 8 virtual devices so
sharding tests work without TPU hardware; numeric semantics are identical.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon TPU plugin registers itself even under JAX_PLATFORMS=cpu; pin the
# default device to CPU so tests never touch (and never wait on) the TPU.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass


def pytest_collection_modifyitems(config, items):
    """Serialize big_mem tests under xdist: every big_mem test joins ONE
    xdist loadgroup, so at most one full-chain large-ring context is
    allocated at a time (round-4 verdict Weak 4: two concurrent factor-tree
    recrypt allocations OOM-killed a worker on the 2-core/16G host)."""
    import pytest as _pytest
    for item in items:
        if "big_mem" in item.keywords:
            item.add_marker(_pytest.mark.xdist_group("big_mem_serial"))
