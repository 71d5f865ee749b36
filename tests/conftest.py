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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
