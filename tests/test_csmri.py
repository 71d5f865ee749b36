"""Golden tests for the CSMRI proximal operators (reference env.py:85-98,
transformations.py:22-57)."""
import numpy as np
import torch
import jax.numpy as jnp

from dt4image_restoration_tpu.ops import kspace_consistency, spi_inverse


def test_kspace_consistency_matches_reference_algebra(rng):
    z = (rng.standard_normal((1, 1, 128, 128))
         + 1j * rng.standard_normal((1, 1, 128, 128))).astype(np.complex64)
    y0 = (rng.standard_normal((1, 1, 128, 128))
          + 1j * rng.standard_normal((1, 1, 128, 128))).astype(np.complex64)
    mask = rng.uniform(size=(1, 1, 128, 128)) < 0.3
    mu = np.float32(0.7)

    # Reference algebra (env.py:88-90) recomputed with torch.
    zt = torch.from_numpy(z).clone()
    temp = (mu * zt + torch.from_numpy(y0)) / (1 + mu)
    mt = torch.from_numpy(mask)
    zt[mt] = temp[mt]

    ours = np.asarray(kspace_consistency(
        jnp.asarray(z), jnp.asarray(y0), jnp.asarray(mask), mu))
    np.testing.assert_allclose(ours, zt.numpy(), rtol=1e-5, atol=1e-6)


def test_kspace_consistency_unmasked_passthrough(rng):
    z = jnp.asarray(rng.standard_normal((4, 4)).astype(np.complex64))
    y0 = jnp.zeros((4, 4), jnp.complex64)
    out = kspace_consistency(z, y0, jnp.zeros((4, 4), bool), 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z))


def _torch_spi_inverse(ztilde, K1, K, mu):
    # transformations.py:22-57 algebra recomputed with torch ops.
    z = torch.zeros_like(ztilde)
    K0 = K ** 2 - K1
    indices_0 = (K1 == 0)
    z[indices_0] = ztilde[indices_0] - (K0 / mu)[indices_0]
    func = lambda y: K1 / (torch.exp(y) - 1) - mu * y - K0 + mu * ztilde
    indices_1 = torch.logical_not(indices_0)
    bmin = 1e-5 * torch.ones_like(ztilde)
    bmax = 1.1 * torch.ones_like(ztilde)
    bave = (bmin + bmax) / 2.0
    for _ in range(10):
        tmp = func(bave)
        pos = torch.logical_and(tmp > 0, indices_1)
        neg = torch.logical_and(tmp < 0, indices_1)
        zero = torch.logical_and(tmp == 0, indices_1)
        indices_0 = torch.logical_or(indices_0, zero)
        indices_1 = torch.logical_not(indices_0)
        bmin[pos] = bave[pos]
        bmax[neg] = bave[neg]
        bave[indices_1] = (bmin[indices_1] + bmax[indices_1]) / 2.0
    z[K1 != 0] = bave[K1 != 0]
    return torch.clamp(z, 0.0, 1.0)


def test_spi_inverse_matches_reference(rng):
    ztilde = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    k1 = rng.integers(0, 3, (16, 16)).astype(np.float32)
    k = np.float32(2.0)
    mu = np.float32(5.0)
    ref = _torch_spi_inverse(
        torch.from_numpy(ztilde), torch.from_numpy(k1),
        torch.tensor(k), torch.tensor(mu)).numpy()
    ours = np.asarray(spi_inverse(
        jnp.asarray(ztilde), jnp.asarray(k1), k, mu))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
