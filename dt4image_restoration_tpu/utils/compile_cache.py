"""Persistent XLA compilation cache.

The framework's programs are few and large (whole-rollout scans, the
device-resident search, fused train steps), so repeat invocations —
benches, CLI runs, the test suite on its 1-core CI host — are dominated
by recompilation of byte-identical HLO. Enabling JAX's persistent
compilation cache (keyed on HLO hash + compile options + jaxlib version)
turns every repeat compile into a disk load.

Known cosmetic issue on the CPU backend: reloading an AOT executable
logs `cpu_aot_loader` machine-feature-mismatch errors for the
`+prefer-no-scatter/+prefer-no-gather` pseudo-features XLA appends at
compile time but the host-feature detector never reports. Compile and
execution machines are identical here, so the warnings are noise (they
only surface in captured stderr of failing tests).
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/dt4ir_jax_cache"

# Inherited by subprocesses (the multi-host tests and CLI smoke tests
# spawn fresh interpreters whose sitecustomize imports jax before any
# code of ours runs — the env var is the only hook that early).
_ENV_VAR = "JAX_COMPILATION_CACHE_DIR"


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point this process AND its children at the cache."""
    import jax

    path = path or os.environ.get(_ENV_VAR) or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    os.environ[_ENV_VAR] = path
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took >=1s to build (the default 1s floor
    # skips the many tiny dispatch helpers, keeping the dir small).
    return path
