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

PROBE_TIMEOUT_S = 90.0  # axon-tunnel health probe (outages make devices() hang)


def tpu_reachable(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """True iff the default jax backend is a live TPU.

    Probes in a SUBPROCESS with a hard timeout: a hung ``jax.devices()``
    (tunnel outage) kills the child, not this process.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "tpu" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


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
    ``argv``, the environment already forces CPU, or the TPU probe died
    (``tpu_unreachable`` True, a tunnel outage) — in which case the
    backend has been switched via ``jax.config.update``.
    """
    argv = sys.argv if argv is None else list(argv)
    forced = "--cpu" in argv or _env_forces_cpu()
    tpu_unreachable = False
    if not forced and not tpu_reachable(timeout_s):
        tpu_unreachable = True
        print("[tpu_probe] TPU backend unreachable (tunnel down?) — "
              "falling back to CPU", file=sys.stderr)
    if forced or tpu_unreachable:
        import jax
        jax.config.update("jax_platforms", "cpu")
        return True, tpu_unreachable
    return False, False
