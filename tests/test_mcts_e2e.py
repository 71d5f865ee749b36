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

from tests.test_dt import make_dt_state_dict, torch_dt_forward
from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.inference.mcts import MCTS
from dt4image_restoration_tpu.models import DecisionTransformer, UNetDenoiser
from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
from dt4image_restoration_tpu.utils.checkpoint import (
    convert_dt_state_dict, convert_unet_state_dict)
from dt4image_restoration_tpu.utils.torch_reference import (
    random_unet_state_dict, torch_denoise)

MAXT = 8
CTX = 6
K = 5
ITERS = 4
S = 128 * 128
COLS = ("T", "sigma_d", "mu")  # norm-mode action columns


# --- torch restatement of the reference search ---------------------------

class TEnv:
    def __init__(self, x, z, u, y0, mask, gt):
        self.x, self.z, self.u = x, z, u
        self.y0, self.mask, self.gt = y0, mask, gt


def t_reset(mat):
    """env.reset on the CLIPPED record (datasets clip x0, env consumes it)."""
    def c(arr):
        return torch.view_as_complex(
            torch.from_numpy(np.asarray(arr, np.float32).copy())).reshape(
            1, 1, 128, 128)
    x0 = c(np.clip(np.asarray(mat["x0"], np.float32), 0, None))
    y0 = c(mat["y0"])
    mask = torch.from_numpy(np.asarray(mat["mask"])).reshape(
        1, 1, 128, 128).bool()
    gt = torch.from_numpy(np.asarray(mat["gt"], np.float32)).reshape(
        1, 1, 128, 128)
    return TEnv(x0.clone(), x0.clone(), torch.zeros_like(x0), y0, mask, gt)


def _fft2c(t):
    t = torch.fft.ifftshift(t, dim=(-2, -1))
    t = torch.fft.fftn(t, dim=(-2, -1), norm="ortho")
    return torch.fft.fftshift(t, dim=(-2, -1))


def _ifft2c(t):
    t = torch.fft.ifftshift(t, dim=(-2, -1))
    t = torch.fft.ifftn(t, dim=(-2, -1), norm="ortho")
    return torch.fft.fftshift(t, dim=(-2, -1))


def t_step(unet_sd, env: TEnv, action) -> tuple:
    """One reference env.step (env.py:74-100), non-aliasing."""
    if float(action["T"]) > 0.5:
        return env, True
    xn = torch_denoise(unet_sd, (env.z - env.u).real,
                       float(action["sigma_d"])).to(torch.complex64)
    zn = _fft2c(xn + env.u)
    mu = float(action["mu"])
    temp = (mu * zn + env.y0) / (1 + mu)
    zn = torch.where(env.mask, temp, zn)
    zn = _ifft2c(zn)
    un = env.u + xn - zn
    return TEnv(xn, zn, un, env.y0, env.mask, env.gt), False


def t_sample(loc: float, std: float, z: np.ndarray):
    """sample_action_dict (mcts.py:64-70) with injected raw draws."""
    d = torch.distributions.Normal(float(loc), float(std))
    raw = torch.as_tensor(loc + std * z, dtype=torch.float32)
    action = raw.abs()
    probs = torch.exp(d.log_prob(action))
    probs, idx = torch.sort(probs, descending=True)
    return action[idx].numpy(), probs.numpy()


class TNode:
    def __init__(self, time, prob, parent, edge, index, env, policy_x,
                 policy_rtg):
        self.time, self.prob, self.parent = time, prob, parent
        self.edge, self.index = edge, index
        self.env = env
        self.policy_x = policy_x          # torch (1,1,128,128) real
        self.policy_rtg = float(policy_rtg)
        self.children = []
        self.reward = 0.0
        self.s_visits = 0
        self.action = None

    def __repr__(self):
        return f"Node(time = {self.time}, edge = {self.edge})_{self.index}"

    def backprop(self, reward):
        if reward > self.reward:
            self.reward = reward
            if self.parent is not None:
                self.parent.backprop(reward)


def t_select(parent):
    """select_p_ucb (mcts.py:74-88)."""
    max_p_ucb, best = -1000.0, parent
    s = parent.s_visits
    for c in parent.children:
        p_ucb = (c.reward - parent.reward) + c.prob * float(
            torch.sqrt(torch.log(torch.Tensor([s])))) / (1 + c.s_visits)
        if not np.isnan(p_ucb) and p_ucb > max_p_ucb:
            best, max_p_ucb = c, p_ucb
    return best


def t_build_buffers(node, task_id):
    """build_eval/build_action ancestry reconstruction (mcts.py:40-59)."""
    states = torch.zeros(1, MAXT, S)
    actions = torch.zeros(1, MAXT, 3)
    rtg = torch.zeros(1, MAXT, 1)
    n = node
    while True:
        states[0, n.time] = n.policy_x.real.reshape(-1)
        rtg[0, n.time, 0] = n.policy_rtg
        if n.time < 1:
            break
        n = n.parent
    n = node.parent
    while n is not None:
        actions[0, n.time] = n.action
        if n.time < 1:
            break
        n = n.parent
    task = torch.full((1, CTX), task_id, dtype=torch.long)
    return states, actions, rtg, task


def t_predict(dt_sd, states, actions, rtg, task, time):
    """predict_action_and_rtg (eval.py:146-186), norm mode; mutates
    ``actions`` at slot ``time`` like the reference."""
    lo, hi = (0, CTX) if time < CTX else (time - CTX, time)
    w_ts = torch.arange(lo, hi).reshape(1, CTX, 1)
    with torch.no_grad():
        pa, _ = torch_dt_forward(dt_sd, rtg[:, lo:hi], states[:, lo:hi],
                                 w_ts, task, actions[:, lo:hi], "norm")
        idx = time if time < CTX else CTX - 1
        actions[0, time] = pa[0, idx]
        _, pr = torch_dt_forward(dt_sd, rtg[:, lo:hi], states[:, lo:hi],
                                 w_ts, task, actions[:, lo:hi], "norm")
    rtg_idx = time if time < CTX else CTX - 2
    vec = pa[0, idx]
    return vec, {COLS[i]: float(vec[i]) for i in range(3)}, \
        float(pr[0, rtg_idx, 0])


def torch_run_mcts(dt_sd, unet_sd, mat, rtg0, task_id, seed):
    """run_mcts (mcts.py:212-258) with D1 factored out; returns
    (final reward, trace of per-iteration expansion records)."""
    rng = np.random.default_rng(seed)
    env = t_reset(mat)
    root = TNode(0, 1.0, None, 0, 0, env, env.x, rtg0)
    root.s_visits = 1
    rewards, states_d, trace = {}, {}, []

    for i in range(ITERS):
        root.s_visits += 1
        node = root
        while node.children:
            node = t_select(node)
            node.s_visits += 1

        # EXPAND (expand_tree, mcts.py:103-143).
        states, actions, rtg, task = t_build_buffers(node, task_id)
        av, adict, pred_rtg = t_predict(dt_sd, states, actions, rtg, task,
                                        node.time)
        node.action = av
        z = rng.standard_normal(2 * K)
        sigma_d, _ = t_sample(adict["sigma_d"], 0.2, z[:K])
        mu, probs = t_sample(adict["mu"], 0.001, z[K:])
        policy_env, _ = t_step(unet_sd, node.env, adict)
        for c in range(K):
            child_action = {"T": adict["T"], "sigma_d": float(sigma_d[c]),
                            "mu": float(mu[c])}
            child_env, _ = t_step(unet_sd, node.env, child_action)
            node.children.append(TNode(
                node.time + 1, float(probs[c]), node, c, i, child_env,
                policy_env.x, pred_rtg))

        # ROLLOUT (run_beam_search -> run_greedy(no_ref=True)).
        rep = repr(node)
        if rep in rewards:
            reward = rewards[rep]
        else:
            states, actions, rtg, task = t_build_buffers(node, task_id)
            _, ad, _ = t_predict(dt_sd, states, actions, rtg, task,
                                 node.time)
            env_r, pr = node.env, node.policy_rtg
            for time in range(node.time, MAXT + 1):
                env_r, done = t_step(unet_sd, env_r, ad)
                if time == MAXT or done:
                    break
                states[0, time] = env_r.x.real.reshape(-1)
                rtg[0, time, 0] = pr
                _, ad, pr = t_predict(dt_sd, states, actions, rtg, task,
                                      time)
            x = env_r.x.real.numpy().reshape(1, 128, 128)
            reward = float(proxy_value_fn(x))
            rewards[rep] = reward
            states_d[rep] = x
        node.backprop(reward)
        trace.append({"iter": i, "time": node.time, "edge": node.edge,
                      "index": node.index,
                      "probs": [c.prob for c in node.children],
                      "reward": reward})

    best = max(rewards, key=rewards.get)
    x = np.clip(states_d[best], 0, 1)
    gt = np.asarray(mat["gt"], np.float32).reshape(1, 128, 128)
    mse = float(np.mean((np.clip(gt, 0, 1) - x) ** 2))
    return 10.0 * np.log10(1.0 / mse), trace


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
