"""Golden tests for the centered orthonormal FFT pair vs torch.fft
(the reference convention at transformations.py:6-19)."""
import numpy as np
import torch
import jax.numpy as jnp

from dt4image_restoration_tpu.ops import fft2c, ifft2c


def _torch_fft2c(img: torch.Tensor) -> torch.Tensor:
    out = torch.fft.ifftshift(img, dim=(-2, -1))
    out = torch.fft.fftn(out, dim=(-2, -1), norm="ortho")
    return torch.fft.fftshift(out, dim=(-2, -1))


def _torch_ifft2c(img: torch.Tensor) -> torch.Tensor:
    out = torch.fft.ifftshift(img, dim=(-2, -1))
    out = torch.fft.ifftn(out, dim=(-2, -1), norm="ortho")
    return torch.fft.fftshift(out, dim=(-2, -1))


def test_fft2c_matches_torch(rng):
    x = rng.standard_normal((2, 1, 128, 128)).astype(np.float32) \
        + 1j * rng.standard_normal((2, 1, 128, 128)).astype(np.float32)
    ours = np.asarray(fft2c(jnp.asarray(x)))
    ref = _torch_fft2c(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ifft2c_matches_torch(rng):
    x = rng.standard_normal((1, 1, 128, 128)).astype(np.float32) \
        + 1j * rng.standard_normal((1, 1, 128, 128)).astype(np.float32)
    ours = np.asarray(ifft2c(jnp.asarray(x)))
    ref = _torch_ifft2c(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_roundtrip_identity(rng):
    x = rng.standard_normal((1, 64, 64)).astype(np.float32)
    back = np.asarray(ifft2c(fft2c(jnp.asarray(x, dtype=jnp.complex64))))
    np.testing.assert_allclose(back.real, x, atol=1e-5)
    np.testing.assert_allclose(back.imag, 0.0, atol=1e-5)


def test_orthonormal_energy(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    k = np.asarray(fft2c(jnp.asarray(x, dtype=jnp.complex64)))
    np.testing.assert_allclose(
        np.sum(np.abs(k) ** 2), np.sum(x ** 2), rtol=1e-5)


def test_dc_component_centered():
    x = jnp.ones((8, 8), dtype=jnp.complex64)
    k = np.array(fft2c(x))
    # DC (the only nonzero bin for a constant image) must sit at (H//2, W//2).
    assert abs(k[4, 4]) > 7.9
    k[4, 4] = 0
    np.testing.assert_allclose(np.abs(k), 0.0, atol=1e-5)
