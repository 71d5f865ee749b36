"""Image resampling and layout utilities.

``bilinear_upsample_2x`` reproduces ``torch.nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (the U-Net decoder path,
/root/reference/evaluation/noise.py:39) but is expressed as two small dense
matmuls so the interpolation runs on the TPU MXU instead of a gather:
``y = A_h @ x @ A_w^T`` with static per-size interpolation matrices.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix (float32).

    align_corners=True:  src = i * (in-1)/(out-1)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to >= 0
    (PyTorch ``F.interpolate`` semantics.)
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) NHWC images via two MXU matmuls."""
    h, w = img.shape[-3], img.shape[-2]
    a = jnp.asarray(_interp_matrix(h, out_h, align_corners))
    b = jnp.asarray(_interp_matrix(w, out_w, align_corners))
    out = jnp.einsum("ih,...hwc->...iwc", a, img,
                     preferred_element_type=img.dtype)
    out = jnp.einsum("jw,...iwc->...ijc", b, out,
                     preferred_element_type=img.dtype)
    return out


def bilinear_upsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True on NHWC images."""
    h, w = img.shape[-3], img.shape[-2]
    return resize_bilinear(img, 2 * h, 2 * w, align_corners=True)


def complex2channel(x: jnp.ndarray) -> jnp.ndarray:
    """(N, C, H, W, 2) real/imag pairs -> (N, 2C, H, W) channels
    (reference: env.py:14-19)."""
    n, c, h, w, _ = x.shape
    return jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(n, 2 * c, h, w)


def greyscale_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """(1, H, W) greyscale -> (3, H, W) by padding two zero channels
    (reference: env.py:21-26 — note the reference pads zeros rather than
    repeating the channel, despite its comment)."""
    zeros = jnp.zeros((2,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([x, zeros], axis=0)
