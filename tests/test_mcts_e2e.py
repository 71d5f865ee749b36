"""Cross-framework MCTS end-to-end parity: a torch restatement of the
reference's run_mcts (mcts.py:212-258) and our fused lockstep search, fed
the SAME standard-normal draw stream and the same converted weights, must
expand the same node sequence with the same child priors and land on the
same final reward.

The torch restatement factors out the reference's state-aliasing bug D1
(env.step mutates the shared dict so "siblings" are cumulatively stepped,
mcts.py:118-126 — documented in PARITY.md): each child steps once from the
parent's state, the evidently-intended branching semantics both frameworks
implement.

Shared-draw protocol: both sides consume np.random.default_rng(seed) in
the order (5 sigma_d draws, 5 mu draws) per iteration; raw = loc + std*z,
folded/density-sorted per sample_action_dict (mcts.py:64-70).
"""
import numpy as np
import torch
import jax.numpy as jnp
import pytest

from tests.test_dt import make_dt_state_dict
from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.inference.mcts import MCTS
from dt4image_restoration_tpu.models import DecisionTransformer, UNetDenoiser
from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
from dt4image_restoration_tpu.utils.checkpoint import (
    convert_dt_state_dict, convert_unet_state_dict)
from dt4image_restoration_tpu.utils.torch_reference import (
    random_unet_state_dict)
# The torch search oracle now lives in the package (utils/torch_oracle.py)
# so tools/validate_parity.py can reuse it against real checkpoints; this
# test pins our fused lockstep search against it.
from dt4image_restoration_tpu.utils.torch_oracle import (
    torch_run_mcts as _oracle_mcts)

MAXT = 8
CTX = 6
K = 5
ITERS = 4
S = 128 * 128


def torch_run_mcts(dt_sd, unet_sd, mat, rtg0, task_id, seed):
    return _oracle_mcts(dt_sd, unet_sd, mat, rtg0, task_id, seed,
                        iterations=ITERS, max_timesteps=MAXT, k=K, ctx=CTX,
                        value_fn=proxy_value_fn)


# --- the parity test ------------------------------------------------------

def test_mcts_search_structure_cross_framework():
    gen = torch.Generator().manual_seed(0)
    dt_sd = make_dt_state_dict(gen)
    # Keep rollouts mid-length so the search sees both stop and non-stop
    # programs (probed: untouched random weights stop almost immediately).
    dt_sd["predict_action.0.bias"][0] -= 0.5
    unet_sd = random_unet_state_dict(seed=0)
    mat = make_mat_record(seed=2)
    rtg0, task_id, seed = 0.62, 3, 123

    ref_reward, ref_trace = torch_run_mcts(dt_sd, unet_sd, mat, rtg0,
                                           task_id, seed)

    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm")
    dt_params = convert_dt_state_dict(dt_sd)
    unet_params = convert_unet_state_dict(unet_sd)
    den_model = UNetDenoiser()

    def dt_apply(params, rtg, s, ts, task, actions):
        return DecisionTransformer(cfg).apply(
            {"params": params}, rtg, s, ts, task, actions)

    def denoise(img, sig):
        return den_model.apply({"params": unet_params}, img, sig)

    mcts = MCTS(dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                model_cfg=cfg,
                cfg=MCTSConfig(iterations=ITERS, max_timesteps=MAXT),
                value_fn=proxy_value_fn, record_trace=True)
    record = ((np.zeros((1, S), np.float32),  # policy states ignored by MCTS
               np.full((1, 1), rtg0, np.float32), np.zeros(3, np.float32),
               np.asarray([task_id], np.int32)),
              {**{k: np.asarray(v) for k, v in mat.items()},
               "x0": np.clip(np.asarray(mat["x0"]), 0, None)})
    reward = mcts.run(record, seed=seed)
    trace = mcts.traces[0]

    # Identical search structure: same expanded node at every iteration.
    assert [(t["time"], t["edge"], t["index"]) for t in trace] == \
        [(t["time"], t["edge"], t["index"]) for t in ref_trace]
    # Same child priors (mu densities) at every expansion.
    for ours, ref in zip(trace, ref_trace):
        np.testing.assert_allclose(ours["probs"], ref["probs"], rtol=2e-3)
    # Same rollout rewards along the way and the same final answer.
    for ours, ref in zip(trace, ref_trace):
        assert abs(ours["reward"] - ref["reward"]) < 0.05 * max(
            1.0, abs(ref["reward"]))
    assert abs(reward - ref_reward) < 0.05
