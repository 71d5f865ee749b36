"""Parity tests: Flax Decision Transformer + torch->JAX converter vs a
torch-functional execution of the reference architecture
(/root/reference/transformer/decision_transformer.py:106-275), including the
no-MLP-residual quirk and mode-dependent action key ordering."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.models import DecisionTransformer
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, transform_actions)
from dt4image_restoration_tpu.utils.checkpoint import convert_dt_state_dict

# The torch DT oracle now lives in the package (utils/torch_oracle.py) so
# tools/validate_parity.py can reuse it against real checkpoints; re-exported
# here because the other parity tests import it from this module.
from dt4image_restoration_tpu.utils.torch_oracle import (  # noqa: F401
    make_dt_state_dict, torch_dt_forward)

E, HEADS, BLOCKS, ADIM, MAXT = 128, 4, 5, 3, 30


@pytest.fixture(scope="module")
def dt_setup():
    gen = torch.Generator().manual_seed(0)
    sd = make_dt_state_dict(gen)
    params = convert_dt_state_dict(sd)
    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm")
    return sd, params, cfg, gen


def _random_inputs(gen, B=2, T=6):
    rtg = torch.randn(B, T, 1, generator=gen)
    states = torch.rand(B, T, 128 * 128, generator=gen)
    timesteps = torch.arange(T).reshape(1, T, 1).repeat(B, 1, 1)
    task = torch.randint(0, 9, (B, T), generator=gen)
    actions = torch.rand(B, T, ADIM, generator=gen)
    return rtg, states, timesteps, task, actions


def test_dt_three_token_parity(dt_setup):
    sd, params, cfg, gen = dt_setup
    rtg, states, timesteps, task, actions = _random_inputs(gen)
    ref_actions, ref_rtg = torch_dt_forward(
        sd, rtg, states, timesteps, task, actions, "norm")

    out = DecisionTransformer(cfg).apply(
        {"params": params}, jnp.asarray(rtg.numpy()),
        jnp.asarray(states.numpy()), jnp.asarray(timesteps.numpy()),
        jnp.asarray(task.numpy()), jnp.asarray(actions.numpy()))

    np.testing.assert_allclose(np.asarray(out.pred_actions),
                               ref_actions.numpy(), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.pred_rtg),
                               ref_rtg.numpy(), rtol=2e-3, atol=2e-4)


def test_dt_two_token_parity(dt_setup):
    sd, params, cfg, gen = dt_setup
    rtg, states, timesteps, task, _ = _random_inputs(gen)
    ref_actions, _ = torch_dt_forward(
        sd, rtg, states, timesteps, task, None, "norm")

    out = DecisionTransformer(cfg).apply(
        {"params": params}, jnp.asarray(rtg.numpy()),
        jnp.asarray(states.numpy()), jnp.asarray(timesteps.numpy()),
        jnp.asarray(task.numpy()), None)

    assert out.pred_rtg is None
    np.testing.assert_allclose(np.asarray(out.pred_actions),
                               ref_actions.numpy(), rtol=2e-3, atol=2e-5)


def test_action_dict_key_order_by_mode():
    raw = jnp.asarray([[[0.1, 0.2, 0.3]]])
    out_norm, d_norm = transform_actions(raw, "norm")
    np.testing.assert_allclose(float(d_norm["T"][0, 0, 0]), 0.1)
    np.testing.assert_allclose(float(d_norm["sigma_d"][0, 0, 0]),
                               0.2 * 70 / 255)
    np.testing.assert_allclose(float(d_norm["mu"][0, 0, 0]), 0.3)

    out_flex, d_flex = transform_actions(raw, "flex")
    np.testing.assert_allclose(float(d_flex["mu"][0, 0, 0]), 0.1)
    np.testing.assert_allclose(float(d_flex["sigma_d"][0, 0, 0]),
                               0.2 * 70 / 255)
    np.testing.assert_allclose(float(d_flex["T"][0, 0, 0]), 0.3)
    # Concatenated output preserves column order in both modes.
    np.testing.assert_allclose(np.asarray(out_norm), np.asarray(out_flex))


def test_init_params_shapes():
    cfg = ModelConfig(block_size=18, n_embeds=6, mode="flex")
    params = init_dt_params(cfg, seed=0)
    assert params["time_embed"]["embedding"].shape == (30, 128)
    assert params["task_embed"]["embedding"].shape == (6, 128)
    assert params["state_encoder"]["dense"]["kernel"].shape == (2304, 128)
    assert params["predict_action"]["kernel"].shape == (128, 3)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert 1_000_000 < n_params < 2_000_000  # ~1.3M like the reference
