"""MCTS tests: PUCB selection, sampling, batched expansion, memoized
rollouts, end-to-end run on synthetic data (reference mcts.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.inference.mcts import (
    MCTS, Node, sample_actions, select_p_ucb)
from dt4image_restoration_tpu.models import DecisionTransformer
from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
from dt4image_restoration_tpu.models.decision_transformer import init_dt_params

CFG = ModelConfig(block_size=18, n_embeds=9, mode="norm")


def dt_apply(params, rtg, states, timesteps, task, actions):
    return DecisionTransformer(CFG).apply(
        {"params": params}, rtg, states, timesteps, task, actions)


def stub_denoise(img, sigma):
    return jnp.clip(0.85 * img + 0.05 + 0.1 * sigma[:, None, None, None],
                    0.0, 1.0)


def test_sample_actions_sorted_by_density():
    samples, probs = sample_actions(np.random.default_rng(0), 0.3, 0.2, 5)
    assert samples.shape == (5,) and probs.shape == (5,)
    assert (samples >= 0).all()  # |N(loc, std)|
    assert (np.diff(probs) <= 1e-7).all()  # descending density


def torch_sample_action_dict(loc, std, raw):
    """Torch restatement of the reference's sample_action_dict
    (mcts.py:64-70) with injectable raw draws: fold to |draws|, evaluate
    the Normal density AT THE FOLDED samples, sort descending."""
    import torch
    import torch.distributions as dist
    d = dist.Normal(float(loc), float(std))
    action = torch.as_tensor(raw, dtype=torch.float64).abs()
    probs = torch.exp(d.log_prob(action))
    probs, idx = torch.sort(probs, descending=True)
    return action[idx].numpy(), probs.numpy()


@pytest.mark.parametrize("loc,std", [(0.27, 0.2), (0.05, 0.2),
                                     (0.3, 0.001), (0.0004, 0.001)])
def test_fold_and_sort_matches_torch_reference(loc, std):
    """Densities must be evaluated at |samples| (not raw draws) and the
    sort order must follow them — pinned against the torch restatement,
    including raw draws forced negative so the fold actually matters."""
    from dt4image_restoration_tpu.inference.mcts import fold_and_sort
    rng = np.random.default_rng(42)
    raw = rng.normal(loc, std, 5)
    raw[1] = -abs(raw[1]) - 0.3 * std  # guarantee a folded draw
    ref_samples, ref_probs = torch_sample_action_dict(loc, std, raw)
    samples, probs = fold_and_sort(raw, loc, std)
    # rtol 1e-4 absorbs our float32 outputs vs the float64 oracle; the
    # fold itself changes densities by orders of magnitude when it fires.
    np.testing.assert_allclose(samples, ref_samples, rtol=1e-4)
    np.testing.assert_allclose(probs, ref_probs, rtol=1e-4)


def test_pucb_selection_round_matches_torch_reference():
    """One full PUCB selection round over mu-density priors, pinned against
    a torch restatement of the reference's select_p_ucb (mcts.py:74-88)."""
    import torch

    def torch_select(parent_reward, s_visits, rewards, probs, visits):
        max_p_ucb, best = -1000.0, None
        for i in range(len(rewards)):
            p_ucb = (rewards[i] - parent_reward) + probs[i] * torch.sqrt(
                torch.log(torch.Tensor([s_visits]))) / (1 + visits[i])
            if p_ucb > max_p_ucb:
                best, max_p_ucb = i, float(p_ucb)
        return best

    # Priors at the reference's mu-density scale (std 0.001 -> O(400)).
    rng = np.random.default_rng(3)
    raw = rng.normal(0.3, 0.001, 5)
    from dt4image_restoration_tpu.inference.mcts import fold_and_sort
    _, probs = fold_and_sort(raw, 0.3, 0.001)
    rewards = [28.1, 28.4, 27.9, 28.3, 28.2]
    visits = [2, 0, 1, 3, 0]

    parent = Node(0, 1.0, None, 0, 0, None, None, 0.5)
    parent.reward, parent.s_visits = 28.0, 7
    for i in range(5):
        c = Node(1, float(probs[i]), parent, i, 0, None, None, 0.5)
        c.reward, c.s_visits = rewards[i], visits[i]
        parent.children.append(c)

    want = torch_select(parent.reward, parent.s_visits, rewards,
                        probs.tolist(), visits)
    assert select_p_ucb(parent) is parent.children[want]


def test_select_p_ucb_prefers_high_reward():
    parent = Node(0, 1.0, None, 0, 0, None, None, 0.5)
    parent.s_visits = 3
    parent.reward = 0.2
    for i, r in enumerate([0.1, 0.9, 0.5]):
        c = Node(1, 0.5, parent, i, 0, None, None, 0.5)
        c.reward = r
        parent.children.append(c)
    best = select_p_ucb(parent)
    assert best is parent.children[1]


def test_backprop_is_max():
    root = Node(0, 1.0, None, 0, 0, None, None, 0.5)
    child = Node(1, 1.0, root, 0, 0, None, None, 0.5)
    child.backprop(5.0)
    assert root.reward == 5.0 and child.reward == 5.0
    child.backprop(3.0)  # lower reward must not overwrite
    assert root.reward == 5.0 and child.reward == 5.0


def _record(seed=0):
    mat = make_mat_record(seed=seed)
    mat = dict(mat)
    mat["x0"] = np.clip(mat["x0"], 0, None)
    states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
    rtg = np.full((1, 1), 0.6, np.float32)
    return (states, rtg, np.zeros(3, np.float32),
            np.asarray([2], np.int32)), mat


@pytest.fixture(scope="module")
def mcts():
    params = init_dt_params(CFG, seed=0)
    return MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG,
                cfg=MCTSConfig(iterations=4, max_timesteps=8),
                value_fn=proxy_value_fn)


def test_expand_creates_batched_children(mcts):
    from dt4image_restoration_tpu.env import reset_from_mat
    record = _record()
    (states0, rtg0, _, task0), mat = record
    env_state = reset_from_mat(mat)
    root = Node(0, 1.0, None, 0, 0, env_state, env_state, float(rtg0[0, 0]))
    root.bufs = mcts._seed_bufs(
        jnp.asarray(states0), jnp.asarray(rtg0).reshape(()),
        jnp.asarray(task0))
    node, adict, pred_rtg = mcts.expand(root, task=2,
                                        rng=np.random.default_rng(1),
                                        index_tree=0)
    assert len(node.children) == 5
    assert node.action is not None and node.action.shape == (3,)
    assert set(adict) == {"T", "sigma_d", "mu"}
    assert np.isfinite(pred_rtg)
    for c in node.children:
        assert c.time == 1
        assert c.env_state.x.shape == (1, 1, 128, 128)
    # Children with different sampled params must differ (branching
    # semantics — NOT the reference's aliasing bug, see mcts.py docstring).
    x0 = np.asarray(node.children[0].env_state.x)
    diffs = [not np.allclose(x0, np.asarray(c.env_state.x))
             for c in node.children[1:]]
    assert any(diffs)

    # Child priors are the MU-sampling densities (reference mcts.py:114-116
    # overwrites probs with the mu densities before Node(prob=...)).
    # Replay the expansion's RNG stream: sigma_d draws first, mu second.
    rng2 = np.random.default_rng(1)
    _ = sample_actions(rng2, adict["sigma_d"], mcts.cfg.sigma_d_std, 5)
    _, mu_probs = sample_actions(rng2, adict["mu"], mcts.cfg.mu_std, 5)
    np.testing.assert_allclose([c.prob for c in node.children], mu_probs,
                               rtol=1e-6)
    # std 0.001 densities are O(100+) — the PUCB exploration scale.
    assert max(c.prob for c in node.children) > 50

    # Children's buffers carry the parent's model action at the parent's
    # slot (the reference's build_action walks the child's parent chain,
    # mcts.py:107-113).
    child_actions = np.asarray(node.children[0].bufs.actions)
    np.testing.assert_allclose(child_actions[0, node.time], node.action,
                               rtol=1e-6)


def test_expansion_done_flag_is_transient(mcts):
    """The reference's done is recomputed from each step's action
    (env.py:79-83), never persisted: children produced by a stop-action
    expansion must still roll out under their own fresh actions."""
    from dt4image_restoration_tpu.env import reset_from_mat
    record = _record()
    (states0, rtg0, _, task0), mat = record
    env_state = reset_from_mat(mat)
    root = Node(0, 1.0, None, 0, 0, env_state, env_state, float(rtg0[0, 0]))
    root.bufs = mcts._seed_bufs(
        jnp.asarray(states0), jnp.asarray(rtg0).reshape(()),
        jnp.asarray(task0))

    # Force the stop action via a batched step with T > 0.5.
    stepped = mcts._expand_step(
        jax.tree.map(lambda x: jnp.repeat(x, 2, axis=0), env_state),
        {"T": np.asarray([0.9, 0.9], np.float32),
         "sigma_d": np.asarray([0.1, 0.1], np.float32),
         "mu": np.asarray([0.3, 0.3], np.float32)})
    assert not bool(stepped.done[0])  # latch cleared
    # State itself frozen by the stop action (reference early return).
    np.testing.assert_array_equal(np.asarray(stepped.x[0]),
                                  np.asarray(env_state.x[0]))


def test_mcts_end_to_end(mcts):
    reward = mcts.run(_record(), seed=0)
    assert np.isfinite(reward)
    assert 0 < reward < 60  # a PSNR-like value


def test_mcts_cached_encoder_matches_uncached(mcts):
    """The state-embedding cache must not change search results."""
    params = mcts.dt_params
    plain = MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                 model_cfg=CFG, cfg=mcts.cfg, value_fn=proxy_value_fn,
                 cached_encoder=False)
    r = _record(seed=3)
    assert plain.run(r, seed=5) == mcts.run(r, seed=5)


def test_mcts_deterministic_given_seed(mcts):
    r1 = mcts.run(_record(seed=1), seed=7)
    r2 = mcts.run(_record(seed=1), seed=7)
    assert r1 == r2


def test_batched_mcts_equivalence(mcts):
    """Lockstep-tree invariants:
    * a batch of one reproduces the sequential search bit-for-bit;
    * identical records with identical seeds inside one batch produce
      identical trees (no cross-tree contamination).
    (Trees in a *mixed* batch may legally diverge from their sequential
    runs: batching reorders conv reductions at the epsilon level and the
    discrete PUCB branching can flip — same sensitivity class as the
    reference's nondeterministic sampling.)"""
    from dt4image_restoration_tpu.inference.mcts import BatchedMCTS
    batched = BatchedMCTS(
        dt_apply=mcts.dt_apply, dt_params=mcts.dt_params,
        denoise=mcts.denoise, model_cfg=mcts.model_cfg, cfg=mcts.cfg,
        value_fn=mcts.value_fn)

    r = _record(seed=2)
    seq = mcts.run(r, seed=11)
    assert batched.run_batch([r], seeds=[11]) == [seq]

    twins = batched.run_batch([r, r], seeds=[11, 11])
    assert twins[0] == twins[1]

    mixed = batched.run_batch([_record(seed=1), r], seeds=[10, 11])
    assert all(np.isfinite(v) and 0 < v < 60 for v in mixed)
