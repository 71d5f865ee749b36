"""Golden tests for PSNR/SSIM semantics (reference env.py:120-125,
transformations.py:61-95)."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from dt4image_restoration_tpu.ops import psnr, ssim
from dt4image_restoration_tpu.ops.metrics import bandwise_psnr


def _torch_psnr(output: torch.Tensor, gt: torch.Tensor) -> torch.Tensor:
    n = output.shape[0]
    output = torch.clamp(output.real, 0, 1)
    mse = torch.mean(
        F.mse_loss(output.view(n, -1), gt.view(n, -1), reduction="none"),
        dim=1)
    return (10 * torch.log10(1 / mse)).unsqueeze(1)


def test_psnr_matches_torch(rng):
    x = rng.uniform(-0.2, 1.2, (3, 1, 128, 128)).astype(np.float32)
    gt = rng.uniform(0, 1, (3, 1, 128, 128)).astype(np.float32)
    ours = np.asarray(psnr(jnp.asarray(x), jnp.asarray(gt)))
    ref = _torch_psnr(torch.from_numpy(x), torch.from_numpy(gt)).numpy()
    assert ours.shape == (3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_psnr_complex_input_uses_real_part(rng):
    x = rng.uniform(0, 1, (1, 128, 128)).astype(np.float32)
    xc = x + 1j * rng.standard_normal((1, 128, 128)).astype(np.float32)
    gt = rng.uniform(0, 1, (1, 128, 128)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(psnr(jnp.asarray(xc), jnp.asarray(gt))),
        np.asarray(psnr(jnp.asarray(x), jnp.asarray(gt))), rtol=1e-5)


def test_psnr_known_value():
    # Uniform error of 0.1 -> MSE 0.01 -> PSNR exactly 20 dB.
    x = jnp.full((1, 16, 16), 0.6)
    gt = jnp.full((1, 16, 16), 0.5)
    np.testing.assert_allclose(np.asarray(psnr(x, gt)), 20.0, rtol=1e-5)


def test_ssim_matches_scipy_formulation(rng):
    img1 = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    img2 = (img1 + rng.normal(0, 10, (64, 64))).astype(np.float32)

    # Reference formulation recomputed with scipy directly.
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = gaussian_filter(img1, sigma=1.5, truncate=5)
    mu2 = gaussian_filter(img2, sigma=1.5, truncate=5)
    s1 = gaussian_filter(img1 ** 2, sigma=1.5, truncate=5) - mu1 ** 2
    s2 = gaussian_filter(img2 ** 2, sigma=1.5, truncate=5) - mu2 ** 2
    s12 = gaussian_filter(img1 * img2, sigma=1.5, truncate=5) - mu1 * mu2
    ref_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))

    ours_map, ours_mean = ssim(jnp.asarray(img1), jnp.asarray(img2))
    np.testing.assert_allclose(np.asarray(ours_map), ref_map,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(ours_mean), ref_map.mean(), rtol=1e-4)


def test_bandwise_psnr(rng):
    x = rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)
    y = rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)
    per_ch = [10 * np.log10(255 ** 2 / np.mean((x[c] - y[c]) ** 2))
              for c in range(3)]
    np.testing.assert_allclose(
        float(bandwise_psnr(jnp.asarray(x), jnp.asarray(y))),
        np.mean(per_ch), rtol=1e-4)
