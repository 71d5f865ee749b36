"""Golden tests for the PnP-ADMM environment step vs the reference algebra
(env.py:74-100) with a stub denoiser, plus done-mask/scan semantics."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.env import (
    CSMRIState, admm_step, compute_reward, fixed_param_rollout,
    get_policy_ob, reset_from_mat)


def stub_denoise(img, sigma):
    """Deterministic stand-in prior: shrink toward the mean + sigma offset
    (NHWC in/out like the real denoiser)."""
    return 0.9 * img + 0.05 * jnp.mean(img, axis=(1, 2, 3), keepdims=True) \
        + sigma[:, None, None, None] * 0.01


def torch_reference_step(x, z, u, mask, y0, mu, denoised):
    """env.py:85-98 algebra with the denoiser output precomputed."""
    x = denoised
    znew = torch.fft.fftshift(
        torch.fft.fftn(torch.fft.ifftshift(x + u, dim=(-2, -1)),
                       dim=(-2, -1), norm="ortho"), dim=(-2, -1))
    temp = (mu * znew.clone() + y0) / (1 + mu)
    znew[mask] = temp[mask]
    znew = torch.fft.fftshift(
        torch.fft.ifftn(torch.fft.ifftshift(znew, dim=(-2, -1)),
                        dim=(-2, -1), norm="ortho"), dim=(-2, -1))
    unew = u + x - znew
    return x, znew, unew


def _ri_to_c(a):
    a = np.asarray(a)
    return a[..., 0] + 1j * a[..., 1]


def test_admm_step_matches_reference_algebra(rng):
    mat = make_mat_record(seed=3)
    state = reset_from_mat(mat)
    action = {"T": 0.0, "mu": 0.3, "sigma_d": 0.1}

    new = admm_step(stub_denoise, state, action)

    # Reference algebra recomputed in torch from the same denoiser output.
    den = stub_denoise(
        jnp.moveaxis(state.z[..., 0] - state.u[..., 0], 1, -1),
        jnp.asarray([0.1]))
    den_t = torch.from_numpy(
        np.array(jnp.moveaxis(den, -1, 1))).to(torch.complex64)
    xt, zt, ut = torch_reference_step(
        torch.from_numpy(np.asarray(state.x)).to(torch.complex64),
        torch.from_numpy(_ri_to_c(state.z)),
        torch.from_numpy(_ri_to_c(state.u)),
        torch.from_numpy(np.array(state.mask)),
        torch.from_numpy(_ri_to_c(state.y0)),
        torch.tensor(0.3), den_t)

    # x is stored real (its imaginary plane is provably never read —
    # env/pnp.py CSMRIState); the torch reference's x stays complex with
    # zero imag here.
    np.testing.assert_allclose(np.asarray(new.x), xt.numpy().real,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xt.numpy().imag, 0.0, atol=1e-7)
    np.testing.assert_allclose(_ri_to_c(new.z), zt.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_ri_to_c(new.u), ut.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.T), 1 / 30, rtol=1e-6)
    assert not bool(new.done[0])


def test_step_early_done_freezes_state():
    mat = make_mat_record(seed=1)
    state = reset_from_mat(mat)
    action = {"T": 0.9, "mu": 0.3, "sigma_d": 0.1}  # T > 0.5 -> stop
    new = admm_step(stub_denoise, state, action)
    assert bool(new.done[0])
    np.testing.assert_array_equal(np.asarray(new.x), np.asarray(state.x))
    np.testing.assert_allclose(np.asarray(new.T), 0.0)

    # Once done, later steps with T<0.5 must also leave the state frozen.
    later = admm_step(stub_denoise, new, {"T": 0.0, "mu": 0.3,
                                          "sigma_d": 0.1})
    assert bool(later.done[0])
    np.testing.assert_array_equal(np.asarray(later.x), np.asarray(state.x))


def test_done_mask_is_per_slice():
    mats = [make_mat_record(seed=s) for s in (1, 2)]
    batch = {k: np.concatenate([m[k] for m in mats]) for k in mats[0]}
    state = reset_from_mat(batch)
    assert state.batch == 2
    action = {"T": np.asarray([0.9, 0.0]), "mu": 0.3, "sigma_d": 0.1}
    new = admm_step(stub_denoise, state, action)
    assert bool(new.done[0]) and not bool(new.done[1])
    np.testing.assert_array_equal(np.asarray(new.x[0]),
                                  np.asarray(state.x[0]))
    assert not np.allclose(np.asarray(new.x[1]), np.asarray(state.x[1]))


def test_policy_ob_and_reward_shapes():
    state = reset_from_mat(make_mat_record())
    ob = get_policy_ob(state)
    assert ob.shape == (1, 128 * 128)
    r = compute_reward(state)
    assert r.shape == (1, 1)


def test_fixed_param_rollout_improves_psnr():
    """Config-1 sanity: 30 data-consistency iterations with a clamping prior
    must beat the zero-filled recon PSNR on a noiseless phantom."""
    mat = make_mat_record(acceleration=4, seed=0)
    state = reset_from_mat(mat)
    psnr0 = float(compute_reward(state)[0, 0])

    clamp_prior = lambda img, sig: jnp.clip(img, 0.0, 1.0)
    final, history = jax.jit(
        lambda s: fixed_param_rollout(clamp_prior, s, mu=0.2, sigma_d=0.05)
    )(state)
    psnr_final = float(compute_reward(final)[0, 0])
    assert history.shape == (30, 1, 1)
    assert psnr_final > psnr0 + 1.0, (psnr0, psnr_final)
    np.testing.assert_allclose(float(final.T[0]), 1.0, rtol=1e-4)


def test_rollout_jit_and_eager_agree():
    mat = make_mat_record(seed=5)
    state = reset_from_mat(mat)
    f = lambda s: fixed_param_rollout(stub_denoise, s, 0.4, 0.08, n_iters=5)
    eager_final, _ = f(state)
    jit_final, _ = jax.jit(f)(state)
    np.testing.assert_allclose(np.asarray(eager_final.x),
                               np.asarray(jit_final.x), rtol=1e-4, atol=1e-5)


def test_reset_from_mat_infers_record_geometry():
    """reset_from_mat defaults to the record's own (square) size — the
    reference env hardcodes 128 (env.py:57-71); non-128 slices run the
    same ADMM loop end to end (fixed-parameter path)."""
    from dt4image_restoration_tpu.env.pnp import fixed_param_rollout
    mat = make_mat_record(size=64, seed=3)
    state = reset_from_mat(mat)
    assert state.x.shape == (1, 1, 64, 64)
    assert state.z.shape == (1, 1, 64, 64, 2)
    final, _ = fixed_param_rollout(
        lambda img, sig: jnp.clip(img, 0, 1), state, 0.5, 15 / 255.0, 3)
    assert final.x.shape == (1, 1, 64, 64)
    assert np.isfinite(np.asarray(final.x)).all()
