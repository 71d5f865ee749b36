"""CSMRI proximal / data-consistency operators.

Pure-functional equivalents of the reference's in-place ADMM algebra
(/root/reference/evaluation/env.py:85-98) and the single-photon-imaging
proximal operator (/root/reference/evaluation/utils/transformations.py:22-57),
written branchless so they jit/vmap/scan cleanly on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kspace_consistency(z: jnp.ndarray, y0: jnp.ndarray, mask: jnp.ndarray,
                       mu: jnp.ndarray) -> jnp.ndarray:
    """Masked k-space data-consistency update.

    At sampled k-space locations, replace ``z`` with the mu-weighted blend of
    the current estimate and the measured data ``(mu*z + y0) / (1 + mu)``;
    elsewhere keep ``z`` (reference: env.py:88-90, where it is expressed as a
    boolean scatter ``z[mask] = temp[mask]`` — here a fused ``where`` the TPU
    compiler folds into the surrounding FFT pipeline).

    Args:
      z: complex k-space estimate, (..., H, W).
      y0: complex measured k-space, broadcastable to ``z``.
      mask: boolean sampling mask, broadcastable to ``z``.
      mu: ADMM penalty weight (scalar or broadcastable).
    """
    mu = jnp.asarray(mu, dtype=z.real.dtype)
    blended = (mu * z + y0) / (1.0 + mu)
    return jnp.where(mask, blended, z)


def spi_inverse(ztilde: jnp.ndarray, k1: jnp.ndarray, k: jnp.ndarray,
                mu: jnp.ndarray, n_iters: int = 10) -> jnp.ndarray:
    """Proximal operator for single-photon imaging, Prox_{(1/mu) D}.

    Behavioral parity with transformations.py:22-57: where ``k1 == 0`` the
    closed form ``ztilde - K0/mu`` applies; elsewhere a fixed-iteration
    bisection solves ``K1/(exp(y)-1) - mu*y - K0 + mu*ztilde = 0`` on
    [1e-5, 1.1]. The reference's in-place boolean-index updates become masked
    ``where`` updates (identical fixed 10-iteration trajectory, since an
    entry whose f(bave)==0 freezes: both bounds stop moving for it).
    """
    k0 = k ** 2 - k1
    zero_mask = k1 == 0

    def f(y):
        return k1 / (jnp.exp(y) - 1.0) - mu * y - k0 + mu * ztilde

    bmin = jnp.full_like(ztilde, 1e-5)
    bmax = jnp.full_like(ztilde, 1.1)
    bave = (bmin + bmax) / 2.0

    def body(_, carry):
        bmin, bmax, bave, frozen = carry
        val = f(bave)
        active = ~frozen
        pos = (val > 0) & active
        neg = (val < 0) & active
        frozen = frozen | ((val == 0) & active)
        bmin = jnp.where(pos, bave, bmin)
        bmax = jnp.where(neg, bave, bmax)
        bave = jnp.where(~frozen, (bmin + bmax) / 2.0, bave)
        return bmin, bmax, bave, frozen

    _, _, bave, _ = jax.lax.fori_loop(
        0, n_iters, body, (bmin, bmax, bave, zero_mask))

    z = jnp.where(zero_mask, ztilde - k0 / mu, bave)
    return jnp.clip(z, 0.0, 1.0)
