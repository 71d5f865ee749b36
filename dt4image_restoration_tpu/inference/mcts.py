"""PUCB tree-search inference (the reference's 'mcts' mode).

Behavioral parity with /root/reference/evaluation/mcts.py, restructured
TPU-first: the tree and its control flow stay on the host (tiny), while the
expensive leaves batch onto the device —

  * child expansion: the policy step + all 6 env steps (the model-action
    step and the 5 sampled-parameter steps, mcts.py:114-140) run as ONE
    batched ``admm_step`` call instead of 6 sequential U-Net/FFT passes;
  * rollouts: the greedy rollout from a node's depth reuses the single
    compiled masked scan (evaluator.greedy_rollout with traced start_time),
    so every node depth hits the same XLA program;
  * value scoring: a pluggable no-reference IQA callable (ARNIQA port or
    proxy — models/arniqa.py), memoized per node like the reference's
    ``match_cached_program`` (mcts.py:146-151).

Documented deviations from the reference (SURVEY.md §2 known bugs):
  * mcts.py's ``env.step`` mutates the shared state dict in place, so the
    reference's 5 "siblings" are actually stepped cumulatively from one
    another and every node aliases the same dict (mcts.py:118-126). We
    implement the evidently-intended branching semantics: each child steps
    once from the parent's state.
  * sampling uses jax.random with an explicit seed (the reference uses
    unseeded torch.distributions, mcts.py:64-70), so runs are reproducible.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
from dt4image_restoration_tpu.env.pnp import (
    CSMRIState, admm_step, reset_from_mat)
from dt4image_restoration_tpu.inference.evaluator import (
    EvalBuffers, greedy_rollout, make_policy_step)
from dt4image_restoration_tpu.ops import psnr


class Node:
    """Search-tree node (reference mcts.py:4-59) holding host references to
    device-resident state pytrees."""

    def __init__(self, time: int, prob: float, parent: Optional["Node"],
                 edge: int, index: int, env_state: CSMRIState,
                 policy_state: CSMRIState, policy_rtg: float) -> None:
        self.time = time
        self.prob = float(prob)
        self.parent = parent
        self.edge = edge
        self.index = index
        self.env_state = env_state
        self.policy_state = policy_state
        self.policy_rtg = float(policy_rtg)
        self.children: List["Node"] = []
        self.reward = 0.0
        self.s_visits = 0
        self.action: Optional[np.ndarray] = None  # set when expanded
        self.bufs = None  # device-resident EvalBuffers snapshot
        self._policy_ob: Optional[np.ndarray] = None  # host cache

    @property
    def policy_ob(self) -> np.ndarray:
        """Flattened real policy observation, fetched from device once and
        cached on the host (buffer rebuilds walk the ancestry every
        expansion/rollout, mcts.py:40-51 — refetching per walk would pay a
        device round-trip per ancestor)."""
        if self._policy_ob is None:
            self._policy_ob = np.asarray(
                self.policy_state.x[..., 0]).reshape(-1)
        return self._policy_ob

    def set_policy_state(self, state: CSMRIState) -> None:
        self.policy_state = state
        self._policy_ob = None

    def __repr__(self) -> str:
        return f"Node(time = {self.time}, edge = {self.edge})_{self.index}"

    def backprop(self, reward: float) -> None:
        """Max-backprop to the root (mcts.py:34-38)."""
        if reward > self.reward:
            self.reward = reward
            if self.parent is not None:
                self.parent.backprop(reward)

    def ancestry(self) -> List["Node"]:
        nodes, n = [], self
        while n is not None:
            nodes.append(n)
            n = n.parent
        return nodes


def select_p_ucb(parent: Node, c_base: float = 10.0, c: float = 30.0
                 ) -> Node:
    """PUCB child selection (mcts.py:74-88): score = (child.reward -
    parent.reward) + prob * sqrt(log(parent visits)) / (1 + child visits).
    Falls back to the parent when no child beats the floor score, like the
    reference's ``max_node = parent_node`` initialization."""
    max_p_ucb = -1000.0
    s_visits = parent.s_visits
    log_visits = math.log(s_visits) if s_visits > 0 else -math.inf
    root_term = math.sqrt(log_visits) if log_visits >= 0 else math.nan
    best = parent
    for child in parent.children:
        p_ucb = (child.reward - parent.reward) \
            + child.prob * root_term / (1 + child.s_visits)
        if not math.isnan(p_ucb) and p_ucb > max_p_ucb:
            best, max_p_ucb = child, p_ucb
    return best


def sample_actions(key, loc: float, std: float, n: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """|N(loc, std)| samples sorted by descending density (mcts.py:64-70)."""
    raw = loc + std * jax.random.normal(key, (n,))
    samples = jnp.abs(raw)
    log_prob = -0.5 * ((raw - loc) / std) ** 2 \
        - jnp.log(std * jnp.sqrt(2 * jnp.pi))
    probs = jnp.exp(log_prob)
    order = jnp.argsort(-probs)
    return np.asarray(samples[order]), np.asarray(probs[order])


def _index_state(state: CSMRIState, i: int) -> CSMRIState:
    return jax.tree.map(lambda x: x[i:i + 1], state)


def _tile_state(state: CSMRIState, n: int) -> CSMRIState:
    return jax.tree.map(
        lambda x: jnp.repeat(x, n, axis=0), state)


@dataclasses.dataclass
class MCTS:
    """Tree-search driver. ``value_fn`` maps a restored image (1, H, W)
    float array to a scalar no-reference quality score (ARNIQA in the
    reference, env.py:42-54)."""
    dt_apply: Callable
    dt_params: Any
    denoise: Callable
    model_cfg: ModelConfig
    cfg: MCTSConfig
    value_fn: Callable[[np.ndarray], float]

    def __post_init__(self):
        cfg = self.model_cfg
        self._policy_step = jax.jit(make_policy_step(self.dt_apply, cfg))
        maxt = self.cfg.max_timesteps

        def rollout(params, env_state, bufs, action_dict, pred_rtg,
                    start_time):
            return greedy_rollout(self.dt_apply, self.denoise, cfg, params,
                                  env_state, bufs, action_dict, pred_rtg,
                                  maxt, start_time)

        self._rollout = jax.jit(rollout)
        self._expand_step = jax.jit(
            lambda s, a: admm_step(self.denoise, s, a))

        # Device-resident incremental buffer updates. The reference rebuilds
        # the 2MB policy buffers on the host from node ancestry on every
        # expansion/rollout (mcts.py:40-59,93-108); here each node snapshots
        # its (immutable) device buffers, so ancestry walks and host<->device
        # buffer transfers disappear from the search loop.
        s = cfg.image_size ** 2

        @jax.jit
        def seed_bufs(policy_x0, rtg0, task):
            return EvalBuffers(
                states=jnp.zeros((1, maxt, s)).at[:, 0].set(policy_x0),
                actions=jnp.zeros((1, maxt, cfg.action_dim)),
                rtg=jnp.zeros((1, maxt, 1)).at[:, 0, 0].set(rtg0),
                task=task.reshape(1).astype(jnp.int32))

        @jax.jit
        def child_bufs(bufs, t, stepped_slot0, pred_rtg):
            ob = stepped_slot0.x[..., 0].reshape(1, -1)
            return bufs.replace(
                states=jax.lax.dynamic_update_slice_in_dim(
                    bufs.states, ob[:, None], t, axis=1),
                rtg=jax.lax.dynamic_update_slice_in_dim(
                    bufs.rtg, jnp.reshape(pred_rtg, (1, 1, 1)), t, axis=1))

        self._seed_bufs = seed_bufs
        self._child_bufs = child_bufs

    # -- expansion (mcts.py:103-143) --------------------------------------
    def expand(self, node: Node, task: int, key, index_tree: int
               ) -> Tuple[Node, Dict[str, float], float]:
        action_vec, action_dict, pred_rtg, bufs_upd = self._policy_step(
            self.dt_params, node.bufs, node.time)
        # Record the node's model action in its buffers (descendants see it,
        # like the reference's build_action over expanded ancestors,
        # mcts.py:53-59,107-108).
        node.bufs = bufs_upd
        node.action = np.asarray(action_vec[0])
        adict = {k: float(v[0]) for k, v in jax.device_get(action_dict
                                                           ).items()}

        k1, k2 = jax.random.split(key)
        sigma_d, probs = sample_actions(
            k1, adict["sigma_d"], self.cfg.sigma_d_std, self.cfg.n_children)
        mu, _ = sample_actions(
            k2, adict["mu"], self.cfg.mu_std, self.cfg.n_children)

        # One batched env step: slot 0 = the model action (-> policy_state),
        # slots 1..n = the sampled children.
        n = self.cfg.n_children
        batch_state = _tile_state(node.env_state, n + 1)
        batch_action = {
            "T": np.full((n + 1,), adict["T"], np.float32),
            "sigma_d": np.concatenate([[adict["sigma_d"]], sigma_d]
                                      ).astype(np.float32),
            "mu": np.concatenate([[adict["mu"]], mu]).astype(np.float32),
        }
        stepped = self._expand_step(batch_state, batch_action)

        node.set_policy_state(_index_state(stepped, 0))
        pred_rtg_f = float(pred_rtg[0])
        # All children share one (immutable) buffer snapshot: ancestry
        # states/actions + this node's policy state and RTG at slot time+1.
        shared_bufs = self._child_bufs(node.bufs, node.time + 1,
                                       node.policy_state, pred_rtg[0])
        for i in range(n):
            child = Node(time=node.time + 1, prob=float(probs[i]),
                         parent=node, edge=i, index=index_tree,
                         env_state=_index_state(stepped, i + 1),
                         policy_state=node.policy_state,
                         policy_rtg=pred_rtg_f)
            child.bufs = shared_bufs
            node.children.append(child)
        return node, adict, pred_rtg_f

    # -- rollout (mcts.py:198-207) ----------------------------------------
    def beam_search(self, node: Node, task: int
                    ) -> Tuple[float, np.ndarray, int]:
        _, action_dict, pred_rtg, bufs = self._policy_step(
            self.dt_params, node.bufs, node.time)
        final, _, ep_len, _ = self._rollout(
            self.dt_params, node.env_state, bufs,
            {k: v for k, v in action_dict.items()},
            jnp.full((1,), node.policy_rtg, jnp.float32), node.time)
        x = np.asarray(final.x[..., 0]).reshape(1, *final.x.shape[-3:-1])
        return float(self.value_fn(x)), x, int(ep_len[0])

    # -- driver (mcts.py:212-258) ------------------------------------------
    def run(self, record, seed: Optional[int] = None) -> float:
        (states0, rtg0, _, task0), mat = record
        task = int(np.asarray(task0).reshape(-1)[0])
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)

        env_state = reset_from_mat(mat)
        root = Node(time=0, prob=1.0, parent=None, edge=0, index=0,
                    env_state=env_state, policy_state=env_state,
                    policy_rtg=float(np.asarray(rtg0).reshape(-1)[0]))
        root.bufs = self._seed_bufs(
            jnp.asarray(states0).reshape(1, -1),
            jnp.asarray(rtg0).reshape(()),
            jnp.asarray(task0).reshape(-1)[:1])
        root.s_visits = 1

        program_rewards: Dict[str, float] = {}
        program_states: Dict[str, np.ndarray] = {}

        for i in range(self.cfg.iterations):
            root.s_visits += 1
            node = root
            while node.children:
                node = select_p_ucb(node, self.cfg.c_base, self.cfg.c)
                node.s_visits += 1

            key, sub = jax.random.split(key)
            node, _, _ = self.expand(node, task, sub, i)

            rep = repr(node)
            if rep in program_rewards:
                reward = program_rewards[rep]
            else:
                reward, final_x, _ = self.beam_search(node, task)
                program_rewards[rep] = reward
                program_states[rep] = final_x
            node.backprop(reward)

        best_key = max(program_rewards, key=program_rewards.get)
        best_state = program_states[best_key]
        # Final score: PSNR of the best program's stored final image vs gt
        # (mcts.py:165-192 — the reference passes (gt, state); PSNR's MSE is
        # symmetric and both live in [0,1], so the order is immaterial).
        gt = np.asarray(root.env_state.gt).reshape(1, *best_state.shape[-2:])
        reward = float(psnr(jnp.asarray(gt), jnp.asarray(best_state))[0, 0])
        print("MCTS Reward: ", reward)
        return reward


def run_mcts(mcts: MCTS, record, seed: Optional[int] = None) -> float:
    """Functional entry point mirroring the reference signature
    (mcts.py:212)."""
    return mcts.run(record, seed=seed)
