"""Test configuration: run all tests on CPU with a virtual 8-device mesh.

Multi-chip sharding tests run on a virtual CPU mesh per
XLA_FLAGS=--xla_force_host_platform_device_count=8 (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Force CPU: the suite must be reproducible/deterministic regardless of
# whatever accelerator the outer environment points JAX at. jax may already
# be imported by a pytest plugin (its config snapshots JAX_PLATFORMS at
# import), so update the live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_collection_modifyitems(config, items):
    """`slow`-marked tests (multi-minute cold CPU compiles) only run with
    RUN_SLOW=1, keeping the default suite under ~10 min cold."""
    import pytest

    if os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow (compile-heavy); set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
