"""Golden tests for image resampling vs torch.nn.functional.interpolate —
the #1 parity risk for the U-Net decoder (SURVEY.md §7 hard part (a))."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.ops import (
    bilinear_upsample_2x, complex2channel, greyscale_to_rgb, resize_bilinear)


@pytest.mark.parametrize("size", [8, 16, 17, 31, 64])
def test_upsample_2x_align_corners_matches_torch(rng, size):
    x = rng.standard_normal((2, size, size, 5)).astype(np.float32)
    ours = np.asarray(bilinear_upsample_2x(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    ref = F.interpolate(xt, scale_factor=2, mode="bilinear",
                        align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_size", [(64, 64), (31, 47), (100, 50)])
def test_resize_bilinear_matches_torch(rng, out_size):
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_size, mode="bilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_complex2channel(rng):
    x = rng.standard_normal((2, 3, 8, 8, 2)).astype(np.float32)
    ours = np.asarray(complex2channel(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    ref = xt.permute(0, 1, 4, 2, 3).contiguous().view(2, 6, 8, 8).numpy()
    np.testing.assert_allclose(ours, ref)


def test_greyscale_to_rgb(rng):
    x = rng.standard_normal((1, 16, 16)).astype(np.float32)
    out = np.asarray(greyscale_to_rgb(jnp.asarray(x)))
    assert out.shape == (3, 16, 16)
    np.testing.assert_allclose(out[0], x[0])
    np.testing.assert_allclose(out[1:], 0.0)
