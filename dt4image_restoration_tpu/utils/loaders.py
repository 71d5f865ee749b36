"""Checkpoint -> apply-fn loaders shared by the CLI (main.py) and the
standalone tools (tools/make_dataset.py).

Both accept an orbax checkpoint dir or a reference torch ``.pt`` file
(strict-converted, utils/checkpoint.py) and fall back to random weights
with a loud stderr WARNING when the path is missing — the smoke-test mode
the gated-download environment needs (reference main.py:178-183,
noise.py:139-153 load unconditionally and crash instead).
"""
from __future__ import annotations

import os
import sys


def load_denoiser(path: str, dtype: str = "float32",
                  packed: str = "none", probe_hw: int = 128):
    """Build the plug-in prior: ``denoise(img, sigma)`` over a loaded (or
    random-fallback) ``UNetDenoiser`` parameter tree.

    ``packed='pallas'`` is probe-compiled once at load time on a
    ``(1, probe_hw, probe_hw, 1)`` zero image (``probe_hw=0`` skips the
    probe): Mosaic kernel failures otherwise only surface when the kernel
    is lowered inside the first *evaluation* program — mid-directory on a
    production run. A failed probe degrades to the ``s2d`` XLA path with a
    loud stderr warning naming the compiler error instead of crashing
    (same kernel + geometry => same Mosaic program, so a green probe means
    the embedded compiles are green too)."""
    import jax.numpy as jnp

    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.utils.checkpoint import (
        load_unet_checkpoint, restore_checkpoint)

    # 'none' = the exact direct path; 's2d' = space-to-depth packed 128^2
    # stages (XLA); 'pallas' = fused whole-block Pallas kernels on them;
    # 'winograd' = every 3x3 block via F(2x2,3x3) MXU GEMMs (odd spatial
    # sizes fall back to direct per block). All modes run the SAME
    # parameter tree (PARITY.md D14).
    def build(packed_key):
        return UNetDenoiser(
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            packed={"none": False, "s2d": True, "pallas": "pallas",
                    "winograd": "winograd",
                    "winograd_deep": "winograd_deep"}[packed_key])

    model = build(packed)
    if os.path.isdir(path):
        params = restore_checkpoint(path)
    elif os.path.exists(path):
        params = load_unet_checkpoint(path)
    else:
        print(f"WARNING: denoiser checkpoint {path!r} not found; "
              "using random weights (smoke-test mode)", file=sys.stderr)
        import jax
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            # Init through the direct path: the parameter tree is identical
            # across execution modes (pinned in test_pallas.py), and a
            # Pallas-mode init would trace the kernel before the guarded
            # probe below can catch a failure.
            params = build("none").init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 128, 128, 1)),
                                        jnp.zeros((1,)))["params"]

    if packed == "pallas" and probe_hw:
        import jax
        try:
            jax.block_until_ready(model.apply(
                {"params": params},
                jnp.zeros((1, probe_hw, probe_hw, 1)), jnp.zeros((1,))))
        except Exception as e:  # Mosaic/XLA compile or execute failure
            print("WARNING: --unet_packed pallas failed its probe compile "
                  f"at {probe_hw}x{probe_hw} "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:200]}); "
                  "falling back to the XLA 's2d' packed path",
                  file=sys.stderr)
            model = build("s2d")

    def denoise(img, sigma):
        return model.apply({"params": params}, img, sigma)

    return denoise


def load_dt(cfg, path: str):
    """Load a Decision Transformer checkpoint; returns
    ``(dt_apply, params)``."""
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.utils.checkpoint import (
        load_dt_checkpoint, restore_checkpoint)

    if os.path.isdir(path):
        params = restore_checkpoint(path)
    elif os.path.exists(path):
        params = load_dt_checkpoint(path)
    else:
        print(f"WARNING: DT checkpoint {path!r} not found; using random "
              "weights (smoke-test mode)", file=sys.stderr)
        import jax
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = init_dt_params(cfg, seed=0)
    return make_dt_apply(cfg), params
