"""Image-quality metrics: PSNR (the reward signal) and SSIM.

PSNR matches /root/reference/evaluation/env.py:120-125 (clamp real part to
[0,1], per-image MSE over flattened pixels, ``10*log10(1/mse)``, shape (N,1)).
SSIM matches the Gaussian-window formulation at
/root/reference/evaluation/utils/transformations.py:61-95 (sigma 1.5,
truncate win_size//2) but runs as an XLA depthwise conv instead of scipy.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def psnr(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB, data range [0, 1].

    Args:
      output: (N, ...) restored images (complex accepted; real part is used).
      gt: (N, ...) ground truth.
    Returns:
      (N, 1) PSNR per image.
    """
    n = output.shape[0]
    out = jnp.clip(jnp.real(output), 0.0, 1.0).reshape(n, -1)
    ref = jnp.real(gt).reshape(n, -1)
    mse = jnp.mean((out - ref) ** 2, axis=1)
    return (10.0 * jnp.log10(1.0 / mse))[:, None]


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _gaussian_filter(img: jnp.ndarray, sigma: float, truncate: float
                     ) -> jnp.ndarray:
    """scipy.ndimage.gaussian_filter parity (reflect boundary) on 2-D arrays,
    as two separable 1-D convolutions."""
    radius = int(truncate * sigma + 0.5)
    k = _gaussian_kernel1d(sigma, radius)
    img = jnp.asarray(img, jnp.float32)
    # scipy 'reflect' == numpy 'symmetric' (edge pixel duplicated).
    padded = jnp.pad(img, ((radius, radius), (0, 0)), mode="symmetric")
    out = lax.conv_general_dilated(
        padded[None, None], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID")[0, 0]
    padded = jnp.pad(out, ((0, 0), (radius, radius)), mode="symmetric")
    out = lax.conv_general_dilated(
        padded[None, None], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID")[0, 0]
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, k1: float = 0.01,
         k2: float = 0.03, win_size: int = 11, data_range: float = 255.0):
    """Structural similarity index.

    Returns ``(ssim_map, mean_ssim)`` like transformations.py:61-95.
    """
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    sigma, truncate = 1.5, win_size // 2

    mu1 = _gaussian_filter(img1, sigma, truncate)
    mu2 = _gaussian_filter(img2, sigma, truncate)
    s1 = _gaussian_filter(img1 ** 2, sigma, truncate) - mu1 ** 2
    s2 = _gaussian_filter(img2 ** 2, sigma, truncate) - mu2 ** 2
    s12 = _gaussian_filter(img1 * img2, sigma, truncate) - mu1 * mu2

    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    ssim_map = num / den
    return ssim_map, jnp.mean(ssim_map)


def bandwise_psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 255.0
                  ) -> jnp.ndarray:
    """Mean per-channel PSNR over the channel axis (-3), matching the
    skimage-based ``psnr_qrnn3d`` helper at env.py:127-143."""
    err = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2,
                   axis=(-2, -1))
    return jnp.mean(10.0 * jnp.log10((data_range ** 2) / err))
