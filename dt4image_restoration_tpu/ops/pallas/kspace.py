"""Pallas TPU kernel: fused masked k-space data-consistency update.

The ADMM prox step's elementwise chain (reference env.py:88-90)

    out = where(mask, (mu*z + y0) / (1 + mu), z)

over both real and imag planes, in one VMEM pass per slice. The per-slice
``mu`` is read from SMEM and its reciprocal ``1/(1+mu)`` is computed once
per block, so the inner loop is a single fused multiply-add + select on the
VPU — no intermediate HBM traffic between the FFT and the inverse FFT.

All operands are laid out as 2-D (B*H, W) planes with one (H, W) block per
grid step — flat 2-D blocks lower onto the (sublane, lane) tiling directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(mu_ref, zr_ref, zi_ref, y0r_ref, y0i_ref, mask_ref,
            outr_ref, outi_ref):
    mu = mu_ref[pl.program_id(0), 0]
    inv = 1.0 / (1.0 + mu)
    m = mask_ref[:] != 0
    outr_ref[:] = jnp.where(m, (mu * zr_ref[:] + y0r_ref[:]) * inv,
                            zr_ref[:])
    outi_ref[:] = jnp.where(m, (mu * zi_ref[:] + y0i_ref[:]) * inv,
                            zi_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def kspace_consistency_pallas(z: jnp.ndarray, y0: jnp.ndarray,
                              mask: jnp.ndarray, mu: jnp.ndarray,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Fused k-space consistency on real/imag pairs.

    Args:
      z:    (B, 1, H, W, 2) float32 k-space estimate (ri pairs).
      y0:   (B, 1, H, W, 2) float32 measured k-space.
      mask: (B, 1, H, W) bool sampling mask.
      mu:   (B,) float32 penalty weight per slice.
      interpret: interpreter mode; defaults to auto (True off-TPU).
    Returns:
      (B, 1, H, W, 2) float32 updated k-space.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, _, h, w, _ = z.shape
    zr, zi = z[..., 0].reshape(b * h, w), z[..., 1].reshape(b * h, w)
    y0r, y0i = y0[..., 0].reshape(b * h, w), y0[..., 1].reshape(b * h, w)
    mask_f = mask.reshape(b * h, w).astype(jnp.float32)
    mu2d = mu.reshape(b, 1).astype(jnp.float32)

    plane = pl.BlockSpec((h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            plane, plane, plane, plane, plane,
        ],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((b * h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, w), jnp.float32)),
        interpret=interpret,
    )(mu2d, zr, zi, y0r, y0i, mask_f)
    return jnp.stack([outr, outi], axis=-1).reshape(z.shape)
