"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of a fake backend (SURVEY.md §4 item 6): sharding,
collectives, and scan semantics are identical under
``xla_force_host_platform_device_count``; only raw speed differs.

The container's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU tunnel, so env vars alone are too late — we override the platform via
jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from dt4image_restoration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

# The suite's wall time on the 1-core CI host is dominated by XLA
# recompiles of byte-identical programs (the CLI/multi-host tests spawn
# fresh interpreters). The persistent cache (HLO-hash-keyed) makes
# repeat runs load them from disk; subprocesses inherit it via
# JAX_COMPILATION_CACHE_DIR. See utils/compile_cache.py for the benign
# cpu_aot_loader feature-mismatch warnings this logs on reloads.
enable_persistent_cache()

import numpy as np
import pytest

# The fast tier (`-m "not slow"`) must stay under 5 minutes on the 1-core
# CI host (round-3/4 advertised it; round 5 made it true). Heavyweights
# are listed in tests/slow_tests.txt (measured call time >= 5 s; see the
# file header for the regeneration recipe) and marked here, so one
# mechanism governs the tier instead of scattered per-file marks.
_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    with open(_SLOW_LIST) as f:
        slow_ids = {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
