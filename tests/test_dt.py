"""Parity tests: Flax Decision Transformer + torch->JAX converter vs a
torch-functional execution of the reference architecture
(/root/reference/transformer/decision_transformer.py:106-275), including the
no-MLP-residual quirk and mode-dependent action key ordering."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.models import DecisionTransformer
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, transform_actions)
from dt4image_restoration_tpu.utils.checkpoint import convert_dt_state_dict

E, HEADS, BLOCKS, ADIM, MAXT = 128, 4, 5, 3, 30


def make_dt_state_dict(gen, n_embeds=9):
    sd = {}

    def lin(name, n_in, n_out):
        sd[name + ".weight"] = 0.05 * torch.randn(n_out, n_in, generator=gen)
        sd[name + ".bias"] = 0.05 * torch.randn(n_out, generator=gen)

    sd["time_embed.weight"] = 0.05 * torch.randn(MAXT, E, generator=gen)
    sd["task_embed.weight"] = 0.05 * torch.randn(n_embeds, E, generator=gen)
    lin("embed_action.0", ADIM, E)
    lin("embed_return.0", 1, E)
    sd["state_encoder.0.weight"] = 0.05 * torch.randn(8, 1, 8, 8, generator=gen)
    sd["state_encoder.0.bias"] = 0.05 * torch.randn(8, generator=gen)
    sd["state_encoder.2.weight"] = 0.05 * torch.randn(16, 8, 4, 4, generator=gen)
    sd["state_encoder.2.bias"] = 0.05 * torch.randn(16, generator=gen)
    sd["state_encoder.4.weight"] = 0.05 * torch.randn(16, 16, 3, 3, generator=gen)
    sd["state_encoder.4.bias"] = 0.05 * torch.randn(16, generator=gen)
    lin("state_encoder.7", 2304, E)
    for i in range(BLOCKS):
        for ln in ("ln1", "ln2"):
            sd[f"transformer.{i}.{ln}.weight"] = 1 + 0.05 * torch.randn(
                E, generator=gen)
            sd[f"transformer.{i}.{ln}.bias"] = 0.05 * torch.randn(
                E, generator=gen)
        lin(f"transformer.{i}.c_att.qkv_proj", E, 3 * E)
        lin(f"transformer.{i}.c_att.o_proj", E, E)
        lin(f"transformer.{i}.mlp.fc", E, 4 * E)
        lin(f"transformer.{i}.mlp.fc_proj", 4 * E, E)
    sd["layer_n.weight"] = 1 + 0.05 * torch.randn(E, generator=gen)
    sd["layer_n.bias"] = 0.05 * torch.randn(E, generator=gen)
    lin("predict_action.0", E, ADIM)
    lin("predict_rtg", E, 1)
    return sd


def torch_dt_forward(sd, rtg, states, timesteps, task, actions, mode):
    """decision_transformer.py:212-275 data flow via torch.nn.functional."""
    B, T, _ = states.shape

    def linear(x, name):
        return x @ sd[name + ".weight"].T + sd[name + ".bias"]

    rtg_emb = torch.tanh(linear(rtg, "embed_return.0"))
    x = states.reshape(-1, 1, 128, 128)
    x = F.relu(F.conv2d(x, sd["state_encoder.0.weight"],
                        sd["state_encoder.0.bias"], stride=4))
    x = F.relu(F.conv2d(x, sd["state_encoder.2.weight"],
                        sd["state_encoder.2.bias"], stride=2))
    x = F.relu(F.conv2d(x, sd["state_encoder.4.weight"],
                        sd["state_encoder.4.bias"], stride=1))
    state_emb = torch.tanh(linear(x.flatten(1), "state_encoder.7"))
    state_emb = state_emb.reshape(B, T, E)

    ts = timesteps.to(torch.int64).reshape(B, -1)
    time_emb = sd["time_embed.weight"][ts]
    state_emb = state_emb + sd["task_embed.weight"][task]

    if actions is not None:
        act_emb = torch.tanh(linear(actions, "embed_action.0"))
        tok = torch.zeros(B, 3 * T, E)
        tok[:, ::3] = rtg_emb
        tok[:, 1::3] = state_emb
        tok[:, 2::3] = act_emb
        time_int = torch.repeat_interleave(time_emb, 3, dim=1)
    else:
        tok = torch.zeros(B, 2 * T, E)
        tok[:, ::2] = rtg_emb
        tok[:, 1::2] = state_emb
        time_int = torch.repeat_interleave(time_emb, 2, dim=1)

    x = tok + time_int
    S = x.shape[1]
    mask = torch.tril(torch.ones(S, S)).view(1, 1, S, S)
    for i in range(BLOCKS):
        p = f"transformer.{i}."
        h = F.layer_norm(x, (E,), sd[p + "ln1.weight"], sd[p + "ln1.bias"])
        q, k, v = linear(h, p + "c_att.qkv_proj").split(E, dim=2)
        q = q.view(B, S, HEADS, E // HEADS).transpose(1, 2)
        k = k.view(B, S, HEADS, E // HEADS).transpose(1, 2)
        v = v.view(B, S, HEADS, E // HEADS).transpose(1, 2)
        att = (q @ k.transpose(-1, -2)) / math.sqrt(E // HEADS)
        att = att.masked_fill(mask == 0, float("-inf"))
        att = F.softmax(att, dim=-1)
        y = (att @ v).transpose(1, 2).contiguous().view(B, S, E)
        x = x + linear(y, p + "c_att.o_proj")
        # NOTE: no residual around the MLP (reference quirk, :99-102).
        h = F.layer_norm(x, (E,), sd[p + "ln2.weight"], sd[p + "ln2.bias"])
        x = linear(F.gelu(linear(h, p + "mlp.fc")), p + "mlp.fc_proj")

    x = F.layer_norm(x, (E,), sd["layer_n.weight"], sd["layer_n.bias"])
    stride = 3 if actions is not None else 2
    pred_actions = torch.sigmoid(linear(x[:, 1::stride], "predict_action.0"))
    pred_rtg = linear(x[:, 2::3], "predict_rtg") if actions is not None else None

    # _transform_actions (:266-275): scale sigma_d column by 70/255.
    sigma_col = 1 if mode == "flex" else 1  # sigma_d is column 1 in both modes
    pred_actions = pred_actions.clone()
    pred_actions[..., sigma_col] *= 70.0 / 255.0
    return pred_actions, pred_rtg


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
