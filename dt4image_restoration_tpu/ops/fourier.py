"""Centered orthonormal 2-D FFT pair — the CSMRI forward operator core.

Semantics match /root/reference/evaluation/utils/transformations.py:6-19:
``ifftshift -> fft2(norm='ortho') -> fftshift`` over the last two axes, so the
DC component sits at the image center in k-space. XLA lowers ``jnp.fft`` to
the TPU FFT; these stay pure functions so they fuse into the surrounding
ADMM scan body.
"""
from __future__ import annotations

import jax.numpy as jnp

_AXES = (-2, -1)


def fft2c(img: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal forward 2-D FFT over the last two axes."""
    out = jnp.fft.ifftshift(img, axes=_AXES)
    out = jnp.fft.fftn(out, axes=_AXES, norm="ortho")
    return jnp.fft.fftshift(out, axes=_AXES)


def ifft2c(ksp: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal inverse 2-D FFT over the last two axes."""
    out = jnp.fft.ifftshift(ksp, axes=_AXES)
    out = jnp.fft.ifftn(out, axes=_AXES, norm="ortho")
    return jnp.fft.fftshift(out, axes=_AXES)
