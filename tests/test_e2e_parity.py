"""End-to-end cross-framework parity: the complete greedy evaluation
pipeline (DT policy + U-Net prior + ADMM env over a full episode) executed
(a) entirely in torch, restating the reference's eval semantics
    (eval.py:62-220 + env.py:74-100 + noise.py + decision_transformer.py),
(b) with our converted-weights fused JAX scan,
must agree on the recovered image and episode length — the SURVEY §4
checkpoint-conversion parity requirement, on random (He-scaled) weights.
"""
import numpy as np
import torch
import jax.numpy as jnp
import pytest

from tests.test_dt import make_dt_state_dict, torch_dt_forward
from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.env import reset_from_mat
from dt4image_restoration_tpu.inference import (
    greedy_rollout, initial_policy_setup)
from dt4image_restoration_tpu.models import DecisionTransformer, UNetDenoiser
from dt4image_restoration_tpu.utils.checkpoint import (
    convert_dt_state_dict, convert_unet_state_dict)
from dt4image_restoration_tpu.utils.torch_reference import (
    random_unet_state_dict, torch_denoise)

MAXT = 10
CTX = 6


# Column -> action-key mapping per mode (decision_transformer.py:147-154).
MODE_COLS = {"norm": ("T", "sigma_d", "mu"), "flex": ("mu", "sigma_d", "T")}


def torch_eval_episode(dt_sd, unet_sd, mat, rtg0, task_id,
                       max_timesteps=MAXT, mode="norm"):
    """The reference's full greedy evaluation for one image, in torch.

    Takes the RAW mat record: the env consumes x0 clipped at 0 (the
    dataset's record clip, datasets.py:160), while the policy's initial
    observation reads the UNCLIPPED x0 (datasets.py:163 reads mat['x0'],
    untouched by the clip's rebinding).
    """
    x0 = torch.view_as_complex(
        torch.from_numpy(
            np.clip(np.asarray(mat["x0"], np.float32), 0, None))).reshape(
        1, 1, 128, 128)
    y0 = torch.view_as_complex(
        torch.from_numpy(np.asarray(mat["y0"], np.float32))).reshape(
        1, 1, 128, 128)
    mask = torch.from_numpy(np.asarray(mat["mask"])).reshape(
        1, 1, 128, 128).bool()
    x, z, u = x0.clone(), x0.clone(), torch.zeros_like(x0)

    def fft2c(t):
        t = torch.fft.ifftshift(t, dim=(-2, -1))
        t = torch.fft.fftn(t, dim=(-2, -1), norm="ortho")
        return torch.fft.fftshift(t, dim=(-2, -1))

    def ifft2c(t):
        t = torch.fft.ifftshift(t, dim=(-2, -1))
        t = torch.fft.ifftn(t, dim=(-2, -1), norm="ortho")
        return torch.fft.fftshift(t, dim=(-2, -1))

    def env_step(x, z, u, action):
        if float(action["T"]) > 0.5:
            return x, z, u, True
        xn = torch_denoise(unet_sd, (z - u).real,
                           float(action["sigma_d"])).to(torch.complex64)
        zn = fft2c(xn + u)
        mu = float(action["mu"])
        temp = (mu * zn + y0) / (1 + mu)
        zn = torch.where(mask, temp, zn)
        zn = ifft2c(zn)
        un = u + xn - zn
        return xn, zn, un, False

    # Policy buffers (eval.py:62-100).
    states = torch.zeros(1, max_timesteps, 128 * 128)
    actions = torch.zeros(1, max_timesteps, 3)
    rtg = torch.zeros(1, max_timesteps, 1)
    states[0, 0] = torch.from_numpy(
        np.asarray(mat["x0"], np.float32)[..., 0]).reshape(-1)
    rtg[0, 0] = rtg0
    task = torch.full((1, CTX), task_id, dtype=torch.long)
    ts = torch.arange(CTX).reshape(1, CTX, 1)

    cols = MODE_COLS[mode]

    def to_action(vec):
        return {cols[i]: vec[i] for i in range(3)}

    with torch.no_grad():
        pred_actions, _ = torch_dt_forward(
            dt_sd, rtg[:, :CTX], states[:, :CTX], ts, task, None, mode)
        actions[0, 0] = pred_actions[0, 0]
        action = to_action(pred_actions[0, 0])
        _, pred_rtg_all = torch_dt_forward(
            dt_sd, torch.zeros(1, CTX, 1), states[:, :CTX], ts, task,
            torch.zeros(1, CTX, 3), mode)
        pred_rtg = pred_rtg_all[0, 0, 0]

        for t in range(1, max_timesteps + 1):
            x, z, u, done = env_step(x, z, u, action)
            if t == max_timesteps or done:
                return x.real.numpy(), t

            states[0, t] = x.real.reshape(-1)
            rtg[0, t] = pred_rtg

            lo = 0 if t < CTX else t - CTX
            hi = CTX if t < CTX else t
            w_ts = torch.arange(lo, hi).reshape(1, CTX, 1)
            pa, _ = torch_dt_forward(
                dt_sd, rtg[:, lo:hi], states[:, lo:hi], w_ts, task,
                actions[:, lo:hi], mode)
            idx = t if t < CTX else CTX - 1
            actions[0, t] = pa[0, idx]
            action = to_action(pa[0, idx])
            _, pr = torch_dt_forward(
                dt_sd, rtg[:, lo:hi], states[:, lo:hi], w_ts, task,
                actions[:, lo:hi], mode)
            rtg_idx = t if t < CTX else CTX - 2
            pred_rtg = pr[0, rtg_idx, 0]


def _run_both(dt_sd, unet_sd, mat, rtg0, task_id, mode):
    """Run the torch oracle episode and our fused JAX scan on the same raw
    mat record + converted weights; return (ref_x, ref_len, jax_x, jax_len).
    """
    ref_x, ref_len = torch_eval_episode(dt_sd, unet_sd, mat, rtg0, task_id,
                                        mode=mode)

    cfg = ModelConfig(block_size=18, n_embeds=9, mode=mode)
    dt_params = convert_dt_state_dict(dt_sd)
    unet_params = convert_unet_state_dict(unet_sd)
    den_model = UNetDenoiser()

    def dt_apply(params, rtg, s, ts, task, actions):
        return DecisionTransformer(cfg).apply(
            {"params": params}, rtg, s, ts, task, actions)

    def denoise(img, sig):
        return den_model.apply({"params": unet_params}, img, sig)

    # Mirror EvaluationDataset: env record clipped, policy state unclipped.
    record = dict(mat)
    record["x0"] = np.clip(np.asarray(mat["x0"]), 0, None)
    policy_x0 = jnp.asarray(
        np.asarray(mat["x0"])[..., 0].reshape(1, -1).astype(np.float32))
    env_state = reset_from_mat(record)

    bufs, _, action_dict, pred_rtg = initial_policy_setup(
        dt_apply, cfg, dt_params, policy_x0,
        jnp.full((1,), rtg0), jnp.asarray([task_id]), MAXT)
    final, reward, ep_len, _ = greedy_rollout(
        dt_apply, denoise, cfg, dt_params, env_state, bufs, action_dict,
        pred_rtg, MAXT)
    return ref_x, ref_len, np.asarray(final.x[..., 0]), int(ep_len[0])


@pytest.mark.parametrize("image_seed,mode",
                         [(0, "norm"), (4, "norm"), (0, "flex")])
def test_full_pipeline_cross_framework_parity(image_seed, mode):
    gen = torch.Generator().manual_seed(0)
    dt_sd = make_dt_state_dict(gen)
    # Bias the stop logit low so episodes run full length — the sliding
    # window and the t >= ctx index switch must be exercised cross-framework.
    # The stop action's column differs by mode (T is column 0 in norm,
    # column 2 in flex — decision_transformer.py:147-154).
    stop_col = MODE_COLS[mode].index("T")
    dt_sd["predict_action.0.bias"][stop_col] -= 4.0
    unet_sd = random_unet_state_dict(seed=0)
    mat = make_mat_record(seed=image_seed)

    ref_x, ref_len, jax_x, jax_len = _run_both(
        dt_sd, unet_sd, mat, 0.62, 3, mode)

    assert ref_len == MAXT  # full-length episode (stop logit biased low)
    assert jax_len == ref_len
    np.testing.assert_allclose(jax_x, ref_x, rtol=1e-3, atol=2e-4)


# (stop_bias, weight_seed) pairs probed so the stop lands mid-episode:
# (0.6, 2) stops at t=4 (before the ctx=6 window switch), (0.6, 0) at t=8
# (after it).
EARLY_STOP_CASES = [(0.6, 2), (0.6, 0)]


@pytest.mark.parametrize("stop_bias,weight_seed", EARLY_STOP_CASES)
def test_early_stop_cross_framework_parity(stop_bias, weight_seed):
    """The T > 0.5 early-stop branch, cross-framework: the episode must end
    at the same step in both frameworks and the frozen image must match
    (reference early return, eval.py:202-214 + env.py:79-83). The bias
    values are tuned so stops land mid-episode (1 < t < MAXT), exercising
    buffer writes before the freeze."""
    gen = torch.Generator().manual_seed(weight_seed)
    dt_sd = make_dt_state_dict(gen)
    dt_sd["predict_action.0.bias"][MODE_COLS["norm"].index("T")] += stop_bias
    unet_sd = random_unet_state_dict(seed=0)
    mat = make_mat_record(seed=1)

    ref_x, ref_len, jax_x, jax_len = _run_both(
        dt_sd, unet_sd, mat, 0.62, 3, "norm")

    assert 1 < ref_len < MAXT, f"bias {stop_bias} no longer stops mid-episode"
    assert jax_len == ref_len
    np.testing.assert_allclose(jax_x, ref_x, rtol=1e-3, atol=2e-4)
