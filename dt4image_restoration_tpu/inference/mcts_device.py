"""Device-resident PUCB tree search: the WHOLE 30-iteration MCTS as ONE
XLA program.

The lockstep search in :mod:`mcts` already fuses each PUCB iteration into a
single device program, but the tree itself (selection, backprop, child
bookkeeping) lives on the host, costing one dispatch + one result fetch per
iteration — ~30 round-trips per search, the wall-clock floor on high-RTT
links (benchmarks/RESULTS.md). Here the tree moves on-device as fixed-size
arrays and the search becomes a ``lax.scan`` over iterations:

  * **node arrays** — a search of I iterations with K children per
    expansion touches at most ``1 + I*K`` nodes; parent/first-child
    indices, PUCB statistics (prob, reward, visits), per-node env state
    (x, z, u, T), and a buffer-bank pointer are preallocated at that
    bound (the fixed-shape analogue of the reference's linked ``Node``
    objects, mcts.py:4-59);
  * **selection** (mcts.py:74-88) — a ``lax.while_loop`` descent over the
    index arrays, replicating the host implementation's first-max
    tie-break, the NaN-skip, and the -1000 floor exactly;
  * **expansion + rollout** — the SAME ``search_iter`` body the host
    backend jits per iteration (shared via ``MCTS._search_iter_fn``), so
    the two backends cannot drift;
  * **buffer bank** — children of expansion ``i`` share one policy-buffer
    snapshot; the bank holds ``1 + I`` snapshots and nodes point into it
    (the device analogue of the host version's shared ``child.bufs``);
  * **max-backprop** (mcts.py:34-38) — a ``lax.while_loop`` ascent that
    stops at the first non-improving ancestor, exactly like the
    reference's recursive early return;
  * **value function** — must be jittable here (``value_fn_jax``:
    ``(B, H, W) -> (B,)``); the ARNIQA port and the proxy scorer both have
    batched jit twins (models/arniqa.py). The host backend's per-node
    reward memoization is dropped: a selected leaf is always freshly
    expanded (descent stops only at childless nodes), so the memo never
    hits and the deterministic rollout recomputes identical values.

The -1000 selection floor is mirrored exactly, including its recovery
path: when no child clears the floor at an expanded node, the host loop
(`while node.children`) re-selects that node (select_p_ucb's ``max_node =
parent_node`` init) and inflates its visit count until the exploration
term lifts a child over the floor; the device descent's ``retry`` lanes do
the same (tested with a value scale that trips the floor).

Parity: tests/test_mcts_device.py pins traces (expanded node sequence,
child priors, rollout rewards) and final scores against the host backend
on shared RNG streams — including value sequences that trip the selection
floor; ancestor max-backprop is unit-tested directly (:func:`max_backprop`
is deliberately module-level for that).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dt4image_restoration_tpu.env.pnp import CSMRIState, reset_from_mat
from dt4image_restoration_tpu.inference.evaluator import EvalBuffers
from dt4image_restoration_tpu.inference.mcts import MCTS
from dt4image_restoration_tpu.ops import psnr


def max_backprop(reward: jnp.ndarray, parent: jnp.ndarray,
                 leaf: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Batched max-backprop (reference mcts.py:34-38): from each tree's
    ``leaf``, ascend the ``parent`` chain setting ``reward`` to ``r`` while
    it improves, stopping at the first non-improving ancestor (the host
    ``Node.backprop`` early return).

    ``parent`` must be the CURRENT parent-index array — callers inside a
    scan must pass the carried value (a closure over the initial array
    silently strands every update at the leaf; regression-tested).
    """
    n, n_nodes = reward.shape
    tr = jnp.arange(n)

    def cond(c):
        cur, reward = c
        safe = jnp.maximum(cur, 0)
        return jnp.any((cur >= 0) & (r > reward[tr, safe]))

    def body(c):
        cur, reward = c
        safe = jnp.maximum(cur, 0)
        improve = (cur >= 0) & (r > reward[tr, safe])
        # OOB scatter rows (non-improving lanes) are dropped.
        idx = jnp.where(improve, safe, n_nodes)
        reward = reward.at[tr, idx].set(r)
        return jnp.where(improve, parent[tr, safe], -1), reward

    _, reward = jax.lax.while_loop(cond, body, (leaf, reward))
    return reward


@dataclasses.dataclass
class DeviceMCTS(MCTS):
    """Whole-search-on-device backend. ``value_fn_jax`` is the jittable
    batched no-reference scorer; ``value_fn`` (host callable) is unused at
    search time but kept for interface compatibility."""
    value_fn_jax: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    # Storage dtype for the per-node env states (x, z, u) — the dominant
    # HBM cost of the search (3 x n_nodes full-resolution ri pairs,
    # ~59 MB/tree at 30 iterations in f32; benchmarks/RESULTS.md).
    # 'bfloat16' halves it, lifting the search-batch HBM ceiling; compute
    # stays f32 (states are upcast after the gather), so only the stored
    # snapshots are rounded. Policy buffers and PUCB statistics are
    # unaffected.
    node_dtype: str = "float32"

    def __post_init__(self):
        super().__post_init__()
        if self.value_fn_jax is None:
            from dt4image_restoration_tpu.models.arniqa import (
                proxy_value_fn_jax)
            self.value_fn_jax = proxy_value_fn_jax

        cfg = self.cfg
        I, K = cfg.iterations, cfg.n_children
        n_nodes = 1 + I * K
        store_dtype = jnp.dtype(self.node_dtype)

        def search_all(params, root_bufs: EvalBuffers, root_env: CSMRIState,
                       rtg0, z_all):
            n = root_env.batch
            tr = jnp.arange(n)
            f32, i32 = jnp.float32, jnp.int32

            def node_alloc(root_leaf):
                return jnp.zeros((n, n_nodes) + root_leaf.shape[1:],
                                 store_dtype
                                 ).at[:, 0].set(
                    root_leaf.astype(store_dtype))

            node_x = node_alloc(root_env.x)
            node_z = node_alloc(root_env.z)
            node_u = node_alloc(root_env.u)
            node_T = jnp.zeros((n, n_nodes), f32)
            parent = jnp.full((n, n_nodes), -1, i32)
            first_child = jnp.full((n, n_nodes), -1, i32)
            time = jnp.zeros((n, n_nodes), i32)
            prob = jnp.zeros((n, n_nodes), f32).at[:, 0].set(1.0)
            reward = jnp.zeros((n, n_nodes), f32)
            visits = jnp.zeros((n, n_nodes), i32).at[:, 0].set(1)
            policy_rtg = jnp.zeros((n, n_nodes), f32).at[:, 0].set(
                rtg0.reshape(n))
            buf_id = jnp.zeros((n, n_nodes), i32)

            def bank_alloc(root_leaf):
                return jnp.zeros((n, 1 + I) + root_leaf.shape[1:],
                                 root_leaf.dtype
                                 ).at[:, 0].set(root_leaf)

            bank = jax.tree.map(
                bank_alloc, root_bufs.replace(task=None))
            task = root_bufs.task

            best_reward = jnp.full((n,), -jnp.inf, f32)
            best_final = jnp.zeros_like(root_env.gt)  # (n, 1, H, W)
            best_ep = jnp.zeros((n,), i32)

            # Retry (floor-recovery) safety valve: the host's visit
            # inflation recovers within exp((deficit/prior)^2) passes; past
            # this bound (deficit/prior > ~3, e.g. zero-underflowed priors
            # with value scales > 1000) the host loop would effectively
            # hang and a device while_loop would hang UNINTERRUPTIBLY — so
            # the descent gives up instead, leaving the lane at its current
            # node (which then re-expands, the pre-retry behavior). Never
            # reachable with the shipped value models.
            max_select_iters = n_nodes + 10_000

            def select(first_child, prob, reward, visits):
                """PUCB descent (mcts.py:74-88; host select_p_ucb parity:
                first strict max wins, NaN skipped, -1000 floor). When no
                child clears the floor at an expanded node, the host's
                ``while node.children`` loop re-selects the same node and
                inflates its visit count until the exploration term lifts
                a child over the floor — mirrored by the ``retry`` lanes,
                which stay put and re-increment instead of stopping."""
                visits = visits.at[:, 0].add(1)  # root pre-increment

                def cond(c):
                    _, _, stopped, it = c
                    return jnp.any(~stopped) & (it < max_select_iters)

                def body(c):
                    cur, visits, stopped, it = c
                    fc = first_child[tr, cur]
                    ch = jnp.maximum(fc, 0)[:, None] + jnp.arange(K)
                    ch_r = reward[tr[:, None], ch]
                    ch_p = prob[tr[:, None], ch]
                    ch_v = visits[tr[:, None], ch]
                    pv = visits[tr, cur].astype(f32)
                    # sqrt(log(v)): v >= 1 on the path, so the host's NaN
                    # branch (log < 0) can only fire at v == 0 — mirrored
                    # by the explicit where.
                    term = jnp.where(pv >= 1.0, jnp.sqrt(
                        jnp.log(jnp.maximum(pv, 1.0))), jnp.nan)
                    score = (ch_r - reward[tr, cur][:, None]
                             + ch_p * term[:, None] / (1.0 + ch_v))
                    score = jnp.where(jnp.isnan(score), -jnp.inf, score)
                    best_k = jnp.argmax(score, axis=1)  # first max
                    descend = ~stopped & (fc >= 0)
                    advance = descend & (jnp.max(score, axis=1) > -1000.0)
                    retry = descend & ~advance  # floor tripped: inflate
                    new_cur = jnp.where(advance, ch[tr, best_k], cur)
                    visits = visits.at[tr, new_cur].add(
                        (advance | retry).astype(i32))
                    return new_cur, visits, stopped | (fc < 0), it + 1

                cur, visits, stopped, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros((n,), i32), visits,
                     jnp.zeros((n,), bool), jnp.asarray(0, i32)))
                # Lanes still descending at the iteration bound gave up on
                # floor recovery and will re-expand an internal node —
                # host parity is broken for them. Surfaced to the caller
                # (the host backend would keep inflating visits instead).
                return cur, visits, ~stopped

            def body(carry, it):
                (node_x, node_z, node_u, node_T, parent, first_child, time,
                 prob, reward, visits, policy_rtg, buf_id, bank,
                 best_reward, best_final, best_ep, bailed_acc) = carry
                i, z_i = it

                leaf, visits, bailed = select(first_child, prob, reward,
                                              visits)
                bailed_acc = bailed_acc | bailed
                t_vec = time[tr, leaf]
                env = CSMRIState(
                    x=node_x[tr, leaf].astype(jnp.float32),
                    z=node_z[tr, leaf].astype(jnp.float32),
                    u=node_u[tr, leaf].astype(jnp.float32),
                    mask=root_env.mask,
                    y0=root_env.y0, gt=root_env.gt, T=node_T[tr, leaf],
                    done=jnp.zeros((n,), bool))
                bid = buf_id[tr, leaf]
                bufs = jax.tree.map(lambda b: b[tr, bid], bank
                                    ).replace(task=task)

                (_, pred_rtg, probs, stepped, new_bufs, finals, ep_len
                 ) = self._search_iter_fn(
                    params, bufs, t_vec, env, policy_rtg[tr, leaf],
                    z_i[:, :K], z_i[:, K:])

                # Children occupy slots [1 + i*K, 1 + (i+1)*K).
                base = 1 + i * K
                ch_view = lambda x: x.reshape((n, K + 1) + x.shape[1:]
                                              )[:, 1:]
                upd = lambda arr, v: jax.lax.dynamic_update_slice_in_dim(
                    arr, v, base, axis=1)
                node_x = upd(node_x, ch_view(stepped.x).astype(store_dtype))
                node_z = upd(node_z, ch_view(stepped.z).astype(store_dtype))
                node_u = upd(node_u, ch_view(stepped.u).astype(store_dtype))
                node_T = upd(node_T, ch_view(stepped.T))
                bk = lambda v: jnp.broadcast_to(v[:, None], (n, K))
                parent = upd(parent, bk(leaf))
                time = upd(time, bk(t_vec + 1))
                prob = upd(prob, probs)
                policy_rtg = upd(policy_rtg, bk(pred_rtg))
                buf_id = upd(buf_id, jnp.full((n, K), i + 1, i32))
                first_child = first_child.at[tr, leaf].set(base)
                bank = jax.tree.map(
                    lambda b, v: jax.lax.dynamic_update_slice_in_dim(
                        b, v[:, None], i + 1, axis=1),
                    bank, new_bufs.replace(task=None))

                # finals: (n, 1, H, W) — the rollout's terminal estimates.
                # max_backprop gets the CARRIED parent array (not a stale
                # closure — regression-tested).
                r = self.value_fn_jax(finals[:, 0]).astype(f32).reshape(n)
                reward = max_backprop(reward, parent, leaf, r)
                better = r > best_reward
                best_reward = jnp.where(better, r, best_reward)
                best_final = jnp.where(better[:, None, None, None], finals,
                                       best_final)
                best_ep = jnp.where(better, ep_len.astype(i32), best_ep)

                trace = (leaf, t_vec, probs, r)
                return (node_x, node_z, node_u, node_T, parent, first_child,
                        time, prob, reward, visits, policy_rtg, buf_id,
                        bank, best_reward, best_final, best_ep,
                        bailed_acc), trace

            carry = (node_x, node_z, node_u, node_T, parent, first_child,
                     time, prob, reward, visits, policy_rtg, buf_id, bank,
                     best_reward, best_final, best_ep,
                     jnp.zeros((n,), bool))
            carry, traces = jax.lax.scan(
                body, carry, (jnp.arange(I, dtype=i32), z_all))
            best_final, best_ep, bailed = carry[-3], carry[-2], carry[-1]
            # Final score: PSNR of the best program's stored terminal image
            # vs gt (mcts.py:165-192; argument order immaterial — symmetric
            # MSE over [0,1] images, same as the host backend).
            final_reward = psnr(root_env.gt, best_final)[:, 0]
            return final_reward, best_final, best_ep, bailed, traces

        self._search_all = jax.jit(search_all)

    def run_global_batches(self, records, seeds, batch_size: int) -> list:
        """Search a GLOBAL record list on a multi-process mesh and return
        its rewards in the original order.

        Shards the records across processes in equal contiguous slices
        (wrap-padding the tail so every process stays in lockstep through
        the collective chunk loop), searches each local slice in
        ``batch_size`` chunks, and reassembles the gathered global rows —
        the inverse of ``_prepare_batch``'s padding, kept HERE next to
        that contract (``local_padded_count``) rather than in callers.
        Single-process (or ``mesh=None``) falls back to plain chunking.
        """
        pairs = list(zip(records, seeds))
        n_proc = jax.process_count()
        if self.mesh is None or n_proc <= 1:
            out = []
            for off in range(0, len(pairs), batch_size):
                chunk = pairs[off:off + batch_size]
                out += self.run_batch([r for r, _ in chunk],
                                      seeds=[s for _, s in chunk],
                                      verbose=False)
            return out

        from dt4image_restoration_tpu.training.sharding import (
            padded_per_process)
        n_global = len(pairs)
        if n_global == 0:  # match the single-process branch (no wrap-pad)
            return []
        per_proc = padded_per_process(n_global, self.mesh)
        padded = [pairs[i % n_global] for i in range(n_proc * per_proc)]
        pid = jax.process_index()
        local = padded[pid * per_proc:(pid + 1) * per_proc]
        rewards_g = np.full(n_proc * per_proc, np.nan)
        for off in range(0, per_proc, batch_size):
            chunk = local[off:off + batch_size]
            vals = self.run_batch(
                [r for r, _ in chunk], seeds=[s for _, s in chunk],
                verbose=False, return_global=True)
            cp = self.local_padded_count(len(chunk))
            for p in range(n_proc):
                rows = vals[p * cp:p * cp + len(chunk)]
                rewards_g[p * per_proc + off:
                          p * per_proc + off + len(chunk)] = rows
        return [float(v) for v in rewards_g[:n_global]]

    def run_batch(self, records, seeds=None, detailed: bool = False,
                  verbose: bool = True,
                  return_global: bool = False) -> list:
        """Search N trees in lockstep with ONE device dispatch total.

        ``detailed=True`` returns per-image dicts
        ``{"reward", "image" (H, W), "episode_len"}`` for the best program
        (the serving layer's unit of work) instead of bare rewards.
        ``verbose=False`` suppresses the CLI-parity per-tree reward prints
        (serving hot path).
        ``return_global=True`` (multi-process with a mesh) returns the
        rewards of the WHOLE gathered global batch in process order,
        including every process's padding rows (``local_padded_count``
        per process) — the CLI uses this to reconstruct the global print
        order after sharding records across hosts. Single-process it is a
        no-op.
        """
        self.traces = None
        records, seeds, n_out = self._prepare_batch(records, seeds)

        I, K = self.cfg.iterations, self.cfg.n_children
        # Per-tree RNG stream order matches the host backend exactly:
        # (K sigma_d draws, K mu draws) per iteration.
        z_all = np.stack([np.random.default_rng(s).standard_normal(
            (I, 2 * K)) for s in seeds], axis=1).astype(np.float32)

        mats = {k: np.concatenate([np.asarray(r[1][k]) for r in records])
                for k in ("x0", "y0", "mask", "gt")}
        env_state = reset_from_mat(mats)
        rtg0 = jnp.asarray(np.stack(
            [np.asarray(r[0][1]).reshape(-1)[0] for r in records]),
            jnp.float32)
        task = jnp.asarray(np.stack(
            [np.asarray(r[0][3]).reshape(-1)[0] for r in records]),
            jnp.int32)
        # Root observation = the RESET env's x (clipped record x0),
        # mcts.py:45,215-219 — same as the host backend.
        root_bufs = self._seed_bufs(
            env_state.x_real.reshape(len(records), -1), rtg0, task)

        z_all = jnp.asarray(z_all)
        if self.mesh is not None:
            # Multi-host aware: each process feeds its local tree slice
            # (training/sharding.py shard_eval_inputs). EVERY per-tree
            # input must shard together — rtg0 on the leading axis, the
            # pre-drawn normals on axis 1 (their layout is
            # (iterations, trees, draws)).
            from jax.sharding import PartitionSpec as P
            from dt4image_restoration_tpu.training.sharding import (
                shard_eval_inputs)
            env_state, root_bufs, rtg0 = shard_eval_inputs(
                (env_state, root_bufs, rtg0), self.mesh)
            z_all = shard_eval_inputs(z_all, self.mesh,
                                      spec=P(None, "data"))

        final_reward, best_final, best_ep, bailed, traces = self._search_all(
            self.dt_params, root_bufs, env_state, rtg0, z_all)
        # Fetch ONLY what the caller asked for: the default path moves one
        # scalar per tree (plus the one-byte bail flag) over the link;
        # images/episode lengths only when ``detailed``, traces only when
        # ``record_trace``.
        from dt4image_restoration_tpu.training.sharding import (
            gather_eval_outputs, local_output_offset)
        final_reward, bailed = gather_eval_outputs(
            (final_reward, bailed), mesh=self.mesh)
        # Multi-host gathers return the GLOBAL batch; slice this process's
        # share (records is the padded local list; equal counts asserted).
        off = local_output_offset(len(records), mesh=self.mesh)
        global_reward = final_reward
        final_reward = final_reward[off:off + n_out]
        if bool(np.any(bailed[off:off + n_out])):
            # The selection safety valve tripped: host/device parity is
            # broken for the flagged trees (only reachable with a custom
            # value_fn_jax at extreme scale — never with the shipped
            # models). A warning, not an error: the search still returns
            # a valid (if differently-explored) best program.
            import warnings
            idx = np.nonzero(bailed[off:off + n_out])[0].tolist()
            warnings.warn(
                f"DeviceMCTS selection gave up floor recovery on trees "
                f"{idx}: the host backend would explore differently here "
                f"(value scale likely pathological)", RuntimeWarning,
                stacklevel=2)

        if self.record_trace:
            # Traces are (iterations, global_batch, ...); take this
            # process's columns.
            leaf, t_leaf, probs, r = jax.tree.map(
                lambda x: x[:, off:off + n_out],
                gather_eval_outputs(traces, mesh=self.mesh))
            self.traces = []
            for j in range(n_out):
                tr = []
                for i in range(I):
                    slot = int(leaf[i, j])
                    tr.append({
                        "iter": i, "time": int(t_leaf[i, j]),
                        "edge": (slot - 1) % K if slot > 0 else 0,
                        "index": (slot - 1) // K if slot > 0 else 0,
                        "probs": [float(p) for p in probs[i, j]],
                        "reward": float(r[i, j])})
                self.traces.append(tr)

        if return_global and self.mesh is not None \
                and jax.process_count() > 1:
            return [float(v) for v in global_reward]

        out = []
        for v in final_reward:
            if verbose:
                print("MCTS Reward: ", float(v))
            out.append(float(v))
        if detailed:
            # Device-side slice first so only live rows cross the link on
            # single-process; multi-host gathers the global stack.
            if self.mesh is not None and jax.process_count() > 1:
                best_final, best_ep = gather_eval_outputs(
                    (best_final, best_ep), mesh=self.mesh)
                images = np.asarray(best_final[off:off + n_out, 0])
                eps = np.asarray(best_ep[off:off + n_out])
            else:
                images = np.asarray(best_final[:n_out, 0])
                eps = np.asarray(best_ep[:n_out])
            return [{"reward": out[i], "image": images[i],
                     "episode_len": int(eps[i])}
                    for i in range(n_out)]
        return out
