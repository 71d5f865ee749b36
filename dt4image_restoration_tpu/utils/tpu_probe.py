"""Bounded TPU-backend probe + CPU fallback for standalone scripts.

When the axon tunnel is down, ``jax.devices()`` HANGS instead of erroring
(CLAUDE.md, observed 2026-08-17/18) — any benchmark or demo script that
touches a device first would hang forever. Every standalone entrypoint
calls :func:`ensure_live_backend` BEFORE its first device use: it probes
the default backend in a subprocess with a hard timeout and, on a dead
probe (or an explicit ``--cpu`` flag / ``JAX_PLATFORMS=cpu`` env), flips
the process to the CPU backend via ``jax.config.update`` — the env var
alone is too late under the container's sitecustomize-pinned jax.

The headline ``bench.py`` uses :func:`tpu_reachable` directly so its
driver artifact can record ``extras.tpu_unreachable`` explicitly.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional, Sequence, Tuple

PROBE_TIMEOUT_S = 120.0  # axon-tunnel health probe (outages make devices() hang)

# The probe EXECUTES a tiny jitted computation, not just jax.devices():
# BENCH_r04 was lost to a backend that enumerated devices fine and then
# threw FAILED_PRECONDITION at the first real execution (VERDICT r4 §Weak
# 1) — an enumeration-only probe sails through that signature. The
# platform string prints only after the execution succeeds.
_PROBE_SRC = ("import jax, jax.numpy as jnp; "
              "jax.jit(lambda a: a + 1)(jnp.zeros((8,),)).block_until_ready(); "
              "print(jax.devices()[0].platform)")


def probe_backend(timeout_s: float = PROBE_TIMEOUT_S) -> Optional[str]:
    """The default jax backend's platform string ('tpu' / 'cpu' / 'gpu'),
    or ``None`` when the probe subprocess hangs, errors, or fails to
    EXECUTE a trivial jitted program — the two real outage signatures (a
    dead tunnel hangs ``jax.devices()``; a half-dead backend enumerates
    then throws on execution, BENCH_r04). A healthy non-TPU backend
    answers and must NOT be treated as an outage.

    Probes in a SUBPROCESS with a hard timeout: a hung ``jax.devices()``
    kills the child, not this process.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s, capture_output=True, text=True)
        if r.returncode != 0:
            return None
        tokens = r.stdout.strip().split()
        return tokens[-1] if tokens else None
    except (subprocess.TimeoutExpired, OSError):
        return None


def tpu_reachable(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """True iff the default jax backend is a live TPU."""
    return probe_backend(timeout_s) == "tpu"


def _env_forces_cpu() -> bool:
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    try:  # already flipped in-process (e.g. the test suite's conftest)
        import jax
        if (jax.config.jax_platforms or "") == "cpu":
            return True
    except Exception:  # pragma: no cover — jax always importable here
        pass
    return False


def ensure_live_backend(argv: Optional[Sequence[str]] = None,
                        timeout_s: float = PROBE_TIMEOUT_S,
                        ) -> Tuple[bool, bool]:
    """Guarantee the first device touch cannot hang. Call before any
    jax device use in a standalone script.

    Returns ``(on_cpu, tpu_unreachable)``: ``on_cpu`` is True when the
    process is (now) on the CPU backend — because ``--cpu`` is in
    ``argv``, the environment already forces CPU, or the probe DIED
    (``tpu_unreachable`` True, the tunnel-outage signature) — in which
    case the backend has been switched via ``jax.config.update``. A
    healthy non-TPU default backend (plain CPU/GPU machine) is NOT an
    outage: it is left untouched and ``tpu_unreachable`` stays False.
    """
    argv = sys.argv if argv is None else list(argv)
    forced = "--cpu" in argv or _env_forces_cpu()
    if forced:
        import jax
        jax.config.update("jax_platforms", "cpu")
        return True, False
    platform = probe_backend(timeout_s)
    if platform is None:
        print("[tpu_probe] default backend unreachable (tunnel down?) — "
              "falling back to CPU", file=sys.stderr)
        import jax
        jax.config.update("jax_platforms", "cpu")
        return True, True
    return platform == "cpu", False
