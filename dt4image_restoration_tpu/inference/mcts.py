"""PUCB tree-search inference (the reference's 'mcts' mode).

Behavioral parity with /root/reference/evaluation/mcts.py, restructured
TPU-first: the tree and its control flow stay on the host (tiny), while the
expensive leaves batch onto the device —

  * one fused device program per search iteration: the expansion policy
    step, |Normal| child sampling (standard-normal draws pre-supplied from
    the host RNG stream), all 6 env steps (the model-action step and the 5
    sampled-parameter steps, mcts.py:114-140), the child buffer snapshot,
    AND the full greedy rollout execute as a single dispatch with a single
    result fetch — host<->device round-trips per iteration drop from ~5 to
    1 (the wall-clock bound on high-RTT links);
  * rollouts: the greedy rollout from a node's depth reuses the single
    compiled masked scan (evaluator.greedy_rollout with traced start_time),
    so every node depth hits the same XLA program;
  * N images' trees advance in lockstep (run = a batch of one), so all of
    the above also amortizes across a directory's images;
  * value scoring: a pluggable no-reference IQA callable (ARNIQA port or
    proxy — models/arniqa.py), memoized per node like the reference's
    ``match_cached_program`` (mcts.py:146-151).

Documented deviations from the reference (SURVEY.md §2 known bugs):
  * mcts.py's ``env.step`` mutates the shared state dict in place, so the
    reference's 5 "siblings" are actually stepped cumulatively from one
    another and every node aliases the same dict (mcts.py:118-126). We
    implement the evidently-intended branching semantics: each child steps
    once from the parent's state.
  * sampling uses seeded numpy RNG streams (the reference uses unseeded
    torch.distributions, mcts.py:64-70), so runs are reproducible. Fold/
    density/sort semantics match the reference exactly (fold_and_sort).
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

    def set_policy_state(self, state: CSMRIState) -> None:
        self.policy_state = state

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


def select_p_ucb(parent: Node) -> Node:
    """PUCB child selection (mcts.py:74-88): score = (child.reward -
    parent.reward) + prob * sqrt(log(parent visits)) / (1 + child visits).
    Falls back to the parent when no child beats the floor score, like the
    reference's ``max_node = parent_node`` initialization.

    The reference signature carries ``c_base``/``c`` parameters whose only
    use is a ``beta`` value that is computed and discarded (mcts.py:74-77
    — dead code); they are dropped here rather than kept as silently
    ignored arguments."""
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


def fold_and_sort(raw: np.ndarray, loc: float, std: float
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold raw normal draws to |draws| and sort by descending density.

    Matches the reference exactly (mcts.py:64-70): densities are the
    N(loc, std) pdf evaluated at the FOLDED samples (torch evaluates
    ``log_prob`` on ``sample().abs()``), not at the raw draws — whenever a
    raw draw is negative, both the density value and the sort order follow
    the folded value. Split out from :func:`sample_actions` so parity tests
    can inject the same raw draws into both frameworks.
    """
    samples = np.abs(np.asarray(raw, np.float64))
    probs = np.exp(-0.5 * ((samples - loc) / std) ** 2) \
        / (std * np.sqrt(2 * np.pi))
    order = np.argsort(-probs, kind="stable")
    return (samples[order].astype(np.float32),
            probs[order].astype(np.float32))


def sample_actions(rng: np.random.Generator, loc: float, std: float, n: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """|N(loc, std)| samples sorted by descending density (mcts.py:64-70).

    Host-side numpy: sampling 5 scalars on the accelerator would cost a
    dispatch round-trip per expansion for zero compute.
    """
    raw = loc + std * rng.standard_normal(n)
    return fold_and_sort(raw, loc, std)


def _fold_sort_jnp(raw: jnp.ndarray, loc: jnp.ndarray, std: float
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-jit :func:`fold_and_sort` over a (n_trees, k) batch of raw draws
    with per-tree locs — the device half of the reference's
    sample_action_dict (mcts.py:64-70)."""
    samples = jnp.abs(raw)
    z = (samples - loc[:, None]) / std
    probs = jnp.exp(-0.5 * z * z) / (std * jnp.sqrt(2.0 * jnp.pi))
    order = jnp.argsort(-probs, axis=-1, stable=True)
    return (jnp.take_along_axis(samples, order, axis=-1),
            jnp.take_along_axis(probs, order, axis=-1))


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

    cached_encoder: bool = True  # cache state-encoder outputs in buffers
    record_trace: bool = False   # keep per-iteration search traces
    # (expanded node identity, child priors, rollout reward) in self.traces
    # — used by the cross-framework search-structure parity tests
    mesh: Optional[Any] = None   # jax.sharding.Mesh: shard the lockstep
    # trees over the 'data' axis (multi-chip search; records are padded to
    # a multiple of the axis size and the padding dropped from outputs)

    def __post_init__(self):
        cfg = self.model_cfg
        maxt = self.cfg.max_timesteps

        encode = dt_embed_apply = None
        if self.cached_encoder:
            from dt4image_restoration_tpu.models.decision_transformer import (
                make_dt_embed_apply, make_state_encode)
            encode = make_state_encode(cfg)
            dt_embed_apply = make_dt_embed_apply(cfg)
        self._encode = encode

        self._policy_step = jax.jit(
            make_policy_step(self.dt_apply, cfg, dt_embed_apply))

        def rollout(params, env_state, bufs, action_dict, pred_rtg,
                    start_time):
            return greedy_rollout(self.dt_apply, self.denoise, cfg, params,
                                  env_state, bufs, action_dict, pred_rtg,
                                  maxt, start_time, encode=encode,
                                  dt_embed_apply=dt_embed_apply)

        self._rollout = jax.jit(rollout)

        def expand_step(s, a):
            # The reference's `done` is transient — env.step re-decides from
            # the CURRENT action's T every call (env.py:79-83); it is not
            # persistent state. Clear the latch on expansion outputs so
            # later rollouts/expansions from these nodes step normally under
            # their own freshly predicted actions.
            out = admm_step(self.denoise, s, a)
            return out.replace(done=jnp.zeros_like(out.done))

        self._expand_step = jax.jit(expand_step)

        # Device-resident incremental buffer updates. The reference rebuilds
        # the 2MB policy buffers on the host from node ancestry on every
        # expansion/rollout (mcts.py:40-59,93-108); here each node snapshots
        # its (immutable) device buffers, so ancestry walks and host<->device
        # buffer transfers disappear from the search loop.
        s = cfg.image_size ** 2

        def seed_bufs(params, policy_x0, rtg0, task):
            b = policy_x0.shape[0]
            state_embs = None
            if encode is not None:
                zero_emb = encode(params, jnp.zeros((1, s)))[0]
                state_embs = jnp.broadcast_to(
                    zero_emb, (b, maxt, zero_emb.shape[-1])
                ).at[:, 0].set(encode(params, policy_x0))
            return EvalBuffers(
                states=jnp.zeros((b, maxt, s)).at[:, 0].set(policy_x0),
                actions=jnp.zeros((b, maxt, cfg.action_dim)),
                rtg=jnp.zeros((b, maxt, 1)).at[:, 0, 0].set(
                    rtg0.reshape(b)),
                task=task.reshape(b).astype(jnp.int32),
                state_embs=state_embs)

        def child_bufs(params, bufs, t, stepped_slot0, pred_rtg):
            b = bufs.states.shape[0]
            t = jnp.broadcast_to(jnp.asarray(t, jnp.int32).reshape(-1),
                                 (b,))
            rows = jnp.arange(b)
            ob = stepped_slot0.x.reshape(b, -1)
            new = bufs.replace(
                states=bufs.states.at[rows, t].set(ob),
                rtg=bufs.rtg.at[rows, t, 0].set(
                    jnp.reshape(pred_rtg, (b,))))
            if encode is not None:
                new = new.replace(
                    state_embs=bufs.state_embs.at[rows, t].set(
                        encode(params, ob)))
            return new

        # NOTE: dt_params is deliberately closure-captured (and therefore
        # jit-baked as constants) here: constant-folding makes the seeded
        # state_embs BIT-identical to the in-forward encoder path, which
        # the cached-vs-uncached equality tests pin. Consequence: swapping
        # ``self.dt_params`` after the first call does NOT update these two
        # programs — construct a new instance to change weights.
        self._seed_bufs = jax.jit(
            lambda *a: seed_bufs(self.dt_params, *a))
        self._child_bufs = jax.jit(
            lambda *a: child_bufs(self.dt_params, *a))

        # The fused search iteration: ONE XLA program per PUCB iteration
        # covering the expansion policy step, |Normal| sampling (locs from
        # the in-flight policy output, standard-normal draws pre-supplied by
        # the host RNG stream — they are loc-independent), the batched
        # (children+1)-slot env step, the child buffer snapshot, and the
        # full greedy rollout. The reference's run_beam_search re-predicts
        # on buffers identical to the expansion's (mcts.py:104-111 vs
        # :199-205 — same ancestry reconstruction, env stepping doesn't
        # touch them), so one policy step serves both. Collapses the 4-5
        # host<->device syncs per iteration (the wall-time bound over a
        # ~60ms-RTT link) to one dispatch + one result fetch.
        policy_step_fn = make_policy_step(self.dt_apply, cfg, dt_embed_apply)
        k = self.cfg.n_children

        def search_iter(params, bufs, t_vec, env_state, policy_rtg,
                        z_sig, z_mu):
            n = bufs.states.shape[0]
            action_vec, action_dict, pred_rtg, bufs_upd = policy_step_fn(
                params, bufs, t_vec)
            loc_sig = action_dict["sigma_d"]
            loc_mu = action_dict["mu"]
            sig_samples, _ = _fold_sort_jnp(
                loc_sig[:, None] + self.cfg.sigma_d_std * z_sig, loc_sig,
                self.cfg.sigma_d_std)
            # Child priors = the mu densities (reference overwrite,
            # mcts.py:114-116).
            mu_samples, probs = _fold_sort_jnp(
                loc_mu[:, None] + self.cfg.mu_std * z_mu, loc_mu,
                self.cfg.mu_std)

            # One batched env step over all trees' (k+1) slots: slot 0 = the
            # model action (-> policy_state), slots 1..k = sampled children.
            tiled = jax.tree.map(
                lambda x: jnp.repeat(x, k + 1, axis=0), env_state)
            exp_action = {
                "T": jnp.repeat(action_dict["T"], k + 1),
                "sigma_d": jnp.concatenate(
                    [loc_sig[:, None], sig_samples], axis=1).reshape(-1),
                "mu": jnp.concatenate(
                    [loc_mu[:, None], mu_samples], axis=1).reshape(-1),
            }
            stepped = admm_step(self.denoise, tiled, exp_action)
            # done is transient (see expand_step above).
            stepped = stepped.replace(done=jnp.zeros_like(stepped.done))
            slot0 = jax.tree.map(
                lambda x: x.reshape((n, k + 1) + x.shape[1:])[:, 0], stepped)
            new_bufs = child_bufs(params, bufs_upd, t_vec + 1, slot0,
                                  pred_rtg)

            # Rollout from each leaf's depth (run_beam_search ->
            # run_greedy(node.env_state, node.policy_rtg, node.time, ...),
            # mcts.py:206).
            final, _, ep_len, _ = greedy_rollout(
                self.dt_apply, self.denoise, cfg, params, env_state,
                bufs_upd, action_dict, policy_rtg, maxt, t_vec,
                encode=encode, dt_embed_apply=dt_embed_apply)
            return (action_vec, pred_rtg, probs, stepped, new_bufs,
                    final.x, ep_len)

        # Raw (unjitted) iteration body: DeviceMCTS embeds it inside its
        # whole-search lax.scan (inference/mcts_device.py) so both backends
        # share one definition of the expansion/rollout math.
        self._search_iter_fn = search_iter
        self._search_iter = jax.jit(search_iter)

    # -- expansion (mcts.py:103-143) --------------------------------------
    def expand(self, node: Node, task: int, rng: np.random.Generator,
               index_tree: int) -> Tuple[Node, Dict[str, float], float]:
        action_vec, action_dict, pred_rtg, bufs_upd = self._policy_step(
            self.dt_params, node.bufs, node.time)
        # ``bufs_upd`` holds the node's model action at its slot: descendants
        # inherit it (the reference's build_action walks the CHILD's parent
        # chain, which includes this just-expanded node, mcts.py:107-113).
        # ``node.bufs`` itself stays pre-action — the reference's rollout of
        # this node rebuilds actions from node._parent only (mcts.py:202-205).
        node.action = np.asarray(action_vec[0])
        adict = {k: float(v[0]) for k, v in jax.device_get(action_dict
                                                           ).items()}

        # Child priors are the MU-sampling densities: the reference samples
        # sigma_d first, then ``mu, probs = sample_action_dict(mu, 0.001)``
        # OVERWRITES probs (mcts.py:114-116), and Node(prob=probs[index])
        # uses those (mcts.py:127-131). With std 0.001 the densities are
        # O(400) — the PUCB exploration scale depends on this.
        sigma_d, _ = sample_actions(
            rng, adict["sigma_d"], self.cfg.sigma_d_std,
            self.cfg.n_children)
        mu, probs = sample_actions(
            rng, adict["mu"], self.cfg.mu_std, self.cfg.n_children)

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
        # states/actions INCLUDING this node's model action (bufs_upd) +
        # this node's policy state and RTG at slot time+1.
        shared_bufs = self._child_bufs(bufs_upd, node.time + 1,
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
        x = np.asarray(final.x).reshape(1, *final.x.shape[-2:])
        return float(self.value_fn(x)), x, int(ep_len[0])

    # -- driver (mcts.py:212-258) ------------------------------------------
    def run(self, record, seed: Optional[int] = None) -> float:
        """Search one image (a batch-of-one lockstep run)."""
        return self.run_batch(
            [record],
            seeds=[self.cfg.seed if seed is None else seed])[0]

    def local_padded_count(self, n: int) -> int:
        """Batch size after padding ``n`` local records to this process's
        share of the mesh data axis — the layout contract between
        ``_prepare_batch`` and callers that reconstruct global row order
        from gathered outputs (the CLI's multi-host sharding)."""
        if self.mesh is None:
            return n
        unit = max(1, self.mesh.shape["data"] // jax.process_count())
        return n + (-n) % unit

    def _prepare_batch(self, records, seeds):
        """Default per-tree seeds + mesh padding (padded trees are dropped
        from outputs). Shared by both tree backends."""
        if not records:
            raise ValueError("run_batch needs at least one record "
                             "(empty evaluation directory?)")
        n_out = len(records)
        if seeds is None:
            seeds = [self.cfg.seed + i for i in range(n_out)]
        if self.mesh is not None:
            # Multi-host: records are this process's LOCAL slice; pad to
            # its share of the data axis (local_padded_count).
            pad = self.local_padded_count(n_out) - n_out
            records = list(records) + [records[-1]] * pad
            seeds = list(seeds) + [seeds[-1]] * pad
        return records, seeds, n_out

    def run_batch(self, records, seeds=None) -> list:
        """Advance N independent trees in lockstep with ONE fused device
        program per search iteration (see ``search_iter`` above): selection
        and tree bookkeeping stay on the host (tiny), everything else —
        both DT forwards, sampling, the (children+1)-slot env step, buffer
        snapshots, and the full greedy rollout — runs device-side, with a
        single result fetch per iteration.

        Per-tree RNG streams match a sequential per-image search exactly
        (standard-normal draws are consumed in the same order), so a
        batched search equals N sequential searches up to batching-induced
        float reordering.
        """
        if self.mesh is not None and jax.process_count() > 1:
            raise ValueError(
                "the host-tree backend syncs host state every iteration "
                "and cannot span processes — use DeviceMCTS "
                "(--tree_backend device) on a pod")
        records, seeds, n_out = self._prepare_batch(records, seeds)
        rngs = [np.random.default_rng(s) for s in seeds]
        self.traces = [[] for _ in records] if self.record_trace else None
        # On a multi-device mesh, per-node snapshots are held as HOST numpy
        # and fetched at the iteration's existing single sync: an eager
        # jnp.concatenate over differently-placed shards compiles to a
        # partitioned XLA program *with collectives*, and two concurrently
        # in-flight collective programs (the async ``_search_iter`` dispatch
        # + the eager gather) can join the per-device execution queues in
        # different orders — a cross-program rendezvous deadlock that
        # XLA:CPU aborts (SIGABRT) after its 40 s termination timeout
        # (root-caused round 4; JUDGE_CRASH_r03.log, RESULTS.md "Suite
        # stability"). A numpy gather + one sharded device_put per
        # iteration launches no collective program outside ``_search_iter``
        # itself, whose dispatches are serialized by the result fetch.
        multi_dev = self.mesh is not None and self.mesh.size > 1

        roots = []
        rewards_dicts: List[Dict[str, float]] = []
        states_dicts: List[Dict[str, np.ndarray]] = []
        for (states0, rtg0, _, task0), mat in records:
            env_state = reset_from_mat(mat)
            root = Node(time=0, prob=1.0, parent=None, edge=0, index=0,
                        env_state=env_state, policy_state=env_state,
                        policy_rtg=float(np.asarray(rtg0).reshape(-1)[0]))
            # The root observation is the RESET env state's x (the CLIPPED
            # record x0): reference run_mcts ignores the dataset's policy
            # states and build_eval reads policy_state['x'].real
            # (mcts.py:45,215-219) — unlike the greedy evaluator, whose
            # initial observation is the dataset's unclipped x0.
            root.bufs = self._seed_bufs(
                env_state.x_real.reshape(1, -1),
                jnp.asarray(rtg0).reshape(1),
                jnp.asarray(task0).reshape(-1)[:1])
            if multi_dev:  # host-resident snapshots (see multi_dev above)
                root.bufs = jax.device_get(root.bufs)
                root.env_state = jax.device_get(env_state)
                root.policy_state = root.env_state
            root.s_visits = 1
            roots.append(root)
            rewards_dicts.append({})
            states_dicts.append({})

        k = self.cfg.n_children
        for i in range(self.cfg.iterations):
            # SELECT (host, per tree).
            leaves = []
            for root in roots:
                root.s_visits += 1
                node = root
                while node.children:
                    node = select_p_ucb(node)
                    node.s_visits += 1
                leaves.append(node)

            # Pre-draw the loc-independent standard normals in the same
            # order sample_actions consumes them: k sigma_d draws, then k
            # mu draws, per tree.
            z = np.stack([r.standard_normal(2 * k) for r in rngs])

            # EXPAND + ROLLOUT: one fused dispatch.
            t_vec = jnp.asarray([n.time for n in leaves], jnp.int32)
            bufs_b = _concat_pytrees([n.bufs for n in leaves])
            env_b = _concat_pytrees([n.env_state for n in leaves])
            if self.mesh is not None:
                # Single-process mesh sharding only: this backend syncs
                # host tree state every iteration, which cannot span
                # processes — use DeviceMCTS on a pod.
                from dt4image_restoration_tpu.training.sharding import (
                    shard_eval_inputs)
                bufs_b, env_b = shard_eval_inputs((bufs_b, env_b),
                                                  self.mesh)
            out = self._search_iter(
                self.dt_params, bufs_b, t_vec, env_b,
                jnp.asarray([n.policy_rtg for n in leaves], jnp.float32),
                jnp.asarray(z[:, :k], jnp.float32),
                jnp.asarray(z[:, k:], jnp.float32))
            (action_vec, pred_rtg, probs, stepped, child_bufs_b,
             finals, ep_len) = out
            # The iteration's single host sync. Multi-device meshes also
            # fetch the node snapshots here (see multi_dev above).
            if multi_dev:
                (action_vec_h, pred_rtg_h, probs_h, finals, stepped,
                 child_bufs_b) = jax.device_get(
                    (action_vec, pred_rtg, probs, finals, stepped,
                     child_bufs_b))
            else:
                action_vec_h, pred_rtg_h, probs_h, finals = jax.device_get(
                    (action_vec, pred_rtg, probs, finals))

            for j, node in enumerate(leaves):
                node.action = np.asarray(action_vec_h[j])
                node.set_policy_state(jax.tree.map(
                    lambda x: x[j * (k + 1):j * (k + 1) + 1], stepped))
                shared = _index_pytree(child_bufs_b, j)
                for c in range(k):
                    lo = j * (k + 1) + c + 1
                    child = Node(
                        time=node.time + 1, prob=float(probs_h[j, c]),
                        parent=node, edge=c, index=i,
                        env_state=jax.tree.map(
                            lambda x: x[lo:lo + 1], stepped),
                        policy_state=node.policy_state,
                        policy_rtg=float(pred_rtg_h[j]))
                    child.bufs = shared
                    node.children.append(child)

            for j, node in enumerate(leaves):
                rep = repr(node)
                if rep in rewards_dicts[j]:
                    reward = rewards_dicts[j][rep]
                else:
                    x = finals[j:j + 1].reshape(1, *finals.shape[-2:])
                    reward = float(self.value_fn(x))
                    rewards_dicts[j][rep] = reward
                    states_dicts[j][rep] = x
                node.backprop(reward)
                if self.record_trace:
                    self.traces[j].append({
                        "iter": i, "time": node.time, "edge": node.edge,
                        "index": node.index,
                        "probs": [c.prob for c in node.children],
                        "reward": reward})

        out = []
        # Padded trees (mesh alignment) are dropped from the outputs.
        for j, root in enumerate(roots[:n_out]):
            best_key = max(rewards_dicts[j], key=rewards_dicts[j].get)
            best_state = states_dicts[j][best_key]
            # Final score: PSNR of the best program's stored final image vs
            # gt (mcts.py:165-192 — the reference passes (gt, state); PSNR's
            # MSE is symmetric and both live in [0,1], so the order is
            # immaterial).
            gt = np.asarray(root.env_state.gt).reshape(
                1, *best_state.shape[-2:])
            reward = float(psnr(jnp.asarray(gt),
                                jnp.asarray(best_state))[0, 0])
            print("MCTS Reward: ", reward)
            out.append(reward)
        return out


def _concat_pytrees(trees):
    """Batch per-node pytrees along axis 0. Host numpy leaves (the
    multi-device snapshot path — see ``run_batch``) concatenate on the
    host: eager device concatenation over differently-placed shards
    compiles a collective-bearing program, which must never race the
    in-flight search dispatch (rendezvous deadlock, RESULTS.md)."""
    def cat(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.concatenate(xs, axis=0)
        return jnp.concatenate(xs, axis=0)
    return jax.tree.map(cat, *trees)


def _index_pytree(tree, i: int):
    return jax.tree.map(lambda x: x[i:i + 1], tree)


class BatchedMCTS(MCTS):
    """Alias kept for the CLI/API surface: all of :class:`MCTS` is lockstep-
    batched now (run = a batch of one). The reference (main.py:236-240)
    searches one image at a time; ``run_batch`` advances a directory's trees
    together so DT/U-Net forwards, env steps, rollouts, and host<->device
    round-trips amortize across images (the BASELINE.json north-star
    restructuring)."""


def run_mcts(mcts: MCTS, record, seed: Optional[int] = None) -> float:
    """Functional entry point mirroring the reference signature
    (mcts.py:212)."""
    return mcts.run(record, seed=seed)
