"""Production serving: batched restoration service over the fused programs.

The reference is batch-size-1 scripts; for deployment the unit of work is a
stream of slices. ``RestorationService`` aggregates concurrent requests into
fixed-shape device batches (one compiled XLA program per shape — no
recompiles in steady state), pads partial batches, and resolves each
request with its restored image and metrics.

Three modes:
  * ``policy``  — DT-guided greedy restoration (the eval path)
  * ``fixed``   — fixed-(mu, sigma_d) PnP-ADMM (no policy; config-1 path)
  * ``mcts``    — device-resident PUCB tree search per slice (the mcts
    path); the whole batch of searches is one XLA program
    (inference/mcts_device.py), so search-grade restoration serves at
    interactive latency
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.env.pnp import (
    compute_reward, fixed_param_rollout, reset_from_mat)
from dt4image_restoration_tpu.inference.evaluator import (
    greedy_rollout, initial_policy_setup)


class ServiceOverloaded(RuntimeError):
    """Admission control: the request queue is at ``max_queue_depth``.

    Raised by :meth:`RestorationService.submit` so callers can shed or
    retry elsewhere instead of joining an unbounded queue — at
    saturation, queue wait (not service time) is what blows the tail
    (RESULTS.md round-4: p95 ≈ p99 ≈ 6x p50 from whole-batch turns)."""


@dataclasses.dataclass
class RestorationRequest:
    """One slice to restore: the .mat-style record (x0/y0/mask[/gt]) plus
    the RTG target and task token for policy mode."""
    mat: Mapping[str, Any]
    rtg: float = 0.0
    task: int = 0


@dataclasses.dataclass
class RestorationResult:
    image: np.ndarray          # (H, W) restored slice
    psnr_db: Optional[float]   # vs gt if the record carried one
    episode_len: int


def _settle(fut: Future, result=None, exc: Optional[BaseException] = None
            ) -> None:
    """Resolve a future, tolerating client-side cancel(): these futures are
    never marked running, so a caller may cancel one mid-batch — its
    batchmates' results must still land (set_result on a cancelled future
    raises InvalidStateError, which must not poison the rest of the batch).
    """
    if fut.done():
        return
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except InvalidStateError:
        pass  # lost the race to a concurrent cancel()


class RestorationService:
    """Fixed-batch-shape restoration server.

    Args:
      denoise: (B, H, W, 1), (B,) -> (B, H, W, 1) U-Net apply.
      cfg / dt_apply / dt_params: policy-mode configuration (optional for
        fixed mode).
      batch_size: compiled batch shape; partial batches are padded.
      max_delay_s: minimum patience for filling a partial batch. The
        dispatcher's actual fill window is backlog-aware: it grows to
        ``fill_window_frac`` of the EMA-measured batch turn time
        (capped at ``fill_window_max_s``), floored at ``max_delay_s``.
        Rationale: with ~0.4 s turns, a 10 ms patience used to split a
        concurrently-arriving client cohort into tiny partial batches —
        each turn then served 2-3 requests and the rest queued for
        multiple turns (the round-4 p95 ≈ p99 ≈ 6x p50 tail). Waiting
        ~10% of a turn to coalesce the cohort costs a bounded slice of
        latency and buys whole-cohort batches.
      fill_window_frac / fill_window_max_s: the adaptive window's
        fraction-of-turn and hard cap; ``fill_window_frac=0`` disables
        adaptation (window = ``max_delay_s``, the legacy behavior).
      max_queue_depth: optional admission bound — ``submit`` raises
        :class:`ServiceOverloaded` (counted in ``stats()['rejected']``)
        when the queue already holds this many requests. Bounds the
        worst-case queue wait to ~``max_queue_depth/batch_size`` turns;
        ``None`` (default) keeps the queue unbounded.
      mesh: optional jax.sharding.Mesh — the fixed batch is sharded over
        its 'data' axis so one service instance scales across the chips
        of this host (batch_size must divide evenly). Single-process
        only: the queue-driven dispatcher issues device calls
        asynchronously, which cannot be coordinated across processes
        (run one service per host on a pod instead).
      node_dtype: storage dtype for the search's per-node env snapshots
        ('float32' | 'bfloat16') — mcts mode only; bfloat16 halves the
        search's HBM cost (compute stays f32, see RESULTS.md).
      pipeline_depth: >1 overlaps batches under sustained load: the
        dispatcher thread assembles + dispatches batch N+1 while a
        resolver thread fetches batch N's outputs (JAX dispatch is
        async, so the device never idles waiting on the host fetch —
        on a high-RTT link the fetch round trip leaves the steady-state
        path entirely). Bounded to ``pipeline_depth`` dispatched-but-
        unfetched batches (backpressure via a permit semaphore taken
        before dispatch, returned after fetch). policy/fixed modes only
        (the mcts search fetches inside its own program driver).
    """

    def __init__(self, denoise: Callable, cfg: Optional[ModelConfig] = None,
                 dt_apply: Optional[Callable] = None, dt_params: Any = None,
                 mode: str = "policy", batch_size: int = 8,
                 max_timesteps: int = 30, mu: float = 0.5,
                 sigma_d: float = 15.0 / 255.0,
                 max_delay_s: float = 0.01,
                 search_cfg: Any = None,
                 value_fn_jax: Optional[Callable] = None,
                 mesh: Any = None,
                 node_dtype: str = "float32",
                 pipeline_depth: int = 1,
                 fill_window_frac: float = 0.1,
                 fill_window_max_s: float = 0.5,
                 max_queue_depth: Optional[int] = None) -> None:
        if mode not in ("policy", "mcts", "fixed"):
            raise ValueError(
                f"unknown serving mode {mode!r}; expected one of "
                "'policy', 'mcts', 'fixed'")
        if pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got "
                             f"{pipeline_depth}")
        if pipeline_depth > 1 and mode == "mcts":
            raise ValueError(
                "pipeline_depth > 1 is for policy/fixed modes; the mcts "
                "search driver fetches its own outputs")
        if mode in ("policy", "mcts") and (cfg is None or dt_apply is None):
            raise ValueError(f"{mode} mode needs cfg + dt_apply + dt_params")
        if mesh is not None:
            if jax.process_count() > 1:
                raise ValueError(
                    "RestorationService mesh sharding is single-process "
                    "only (async queue dispatch cannot be coordinated "
                    "across hosts); run one service per host")
            n_data = mesh.shape["data"]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} must be a multiple of the "
                    f"mesh data axis ({n_data})")
        if fill_window_frac < 0:
            raise ValueError(f"fill_window_frac must be >= 0, got "
                             f"{fill_window_frac}")
        if max_queue_depth is not None and max_queue_depth < 1:
            raise ValueError(f"max_queue_depth must be >= 1, got "
                             f"{max_queue_depth}")
        self.mesh = mesh
        self.mode = mode
        self.batch_size = batch_size
        self.max_timesteps = max_timesteps
        self.max_delay_s = max_delay_s
        self.fill_window_frac = fill_window_frac
        self.fill_window_max_s = fill_window_max_s
        self.max_queue_depth = max_queue_depth
        self._turn_ema_s = 0.0  # EMA of batch turn time; 0 = unmeasured
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # Guards the stop-check + enqueue in submit() against close()'s
        # drain: without it a request enqueued between close's stop-set
        # and its drain would never resolve.
        self._submit_lock = threading.Lock()

        if mode == "policy":
            def run(params, policy_x0, rtg0, task, env_state):
                bufs, _, action_dict, pred_rtg = initial_policy_setup(
                    dt_apply, cfg, params, policy_x0, rtg0, task,
                    max_timesteps)
                final, reward, ep_len, _ = greedy_rollout(
                    dt_apply, denoise, cfg, params, env_state, bufs,
                    action_dict, pred_rtg, max_timesteps)
                return final.x, reward, ep_len

            self._program = jax.jit(run)
            self._dt_params = dt_params
        elif mode == "mcts":
            from dt4image_restoration_tpu.config import MCTSConfig
            from dt4image_restoration_tpu.inference.mcts_device import (
                DeviceMCTS)
            from dt4image_restoration_tpu.models.arniqa import (
                proxy_value_fn)
            self._mcts = DeviceMCTS(
                dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                model_cfg=cfg,
                cfg=search_cfg or MCTSConfig(max_timesteps=max_timesteps),
                value_fn=proxy_value_fn, value_fn_jax=value_fn_jax,
                mesh=mesh, node_dtype=node_dtype)
        else:
            def run_fixed(env_state):
                final, _ = fixed_param_rollout(
                    denoise, env_state, mu, sigma_d, max_timesteps)
                ep = jnp.full((env_state.batch,), max_timesteps, jnp.int32)
                return final.x, compute_reward(final), ep

            self._program = jax.jit(run_fixed)

        self._stats_lock = threading.Lock()
        self._stats = {"submitted": 0, "completed": 0, "failed": 0,
                       "cancelled": 0, "rejected": 0, "batches": 0,
                       "padded_slots": 0,
                       "latency_sum_ms": 0.0, "latency_max_ms": 0.0}

        self._resolve_q: Optional["queue.Queue"] = None
        self._resolver: Optional[threading.Thread] = None
        self._inflight: Optional[threading.Semaphore] = None
        if pipeline_depth > 1:
            # Backpressure: the worker takes a permit BEFORE dispatching
            # and the resolver returns it after the fetch settles, so at
            # most pipeline_depth dispatched-but-unfetched batches hold
            # device output buffers — exactly the documented bound (a
            # bounded queue alone over-admitted by one: fetched + queued
            # + one held by a blocked put).
            self._inflight = threading.Semaphore(pipeline_depth)
            self._resolve_q = queue.Queue(maxsize=pipeline_depth)
            self._resolver = threading.Thread(target=self._resolve_loop,
                                              daemon=True)
            self._resolver.start()

        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- public API --------------------------------------------------------
    def submit(self, request: RestorationRequest) -> "Future":
        """Enqueue one slice; returns a Future[RestorationResult].
        Raises ``RuntimeError`` after :meth:`close` — nothing would ever
        drain the queue."""
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("RestorationService is closed")
            if (self.max_queue_depth is not None
                    and self._queue.qsize() >= self.max_queue_depth):
                with self._stats_lock:
                    self._stats["rejected"] += 1
                raise ServiceOverloaded(
                    f"queue depth {self._queue.qsize()} >= max_queue_depth "
                    f"{self.max_queue_depth}; shed or retry later")
            fut: Future = Future()
            self._queue.put((request, fut, time.monotonic()))
        with self._stats_lock:
            self._stats["submitted"] += 1
        return fut

    def restore(self, requests) -> list:
        """Blocking convenience: restore a list of requests."""
        futs = [self.submit(r) for r in requests]
        return [f.result() for f in futs]

    def stats(self) -> dict:
        """Service counters for observability: requests
        submitted/completed/failed/cancelled, batches dispatched, padding
        overhead, submit->resolve latency aggregates, and current queue
        depth. Thread-safe snapshot."""
        with self._stats_lock:
            out = dict(self._stats)
        done = out["completed"]
        lat_sum = out.pop("latency_sum_ms")  # always: stable key schema
        out["latency_mean_ms"] = lat_sum / done if done else 0.0
        out["queue_depth"] = self._queue.qsize()
        return out

    def close(self) -> None:
        with self._submit_lock:
            self._stop.set()
        # The worker drains at most one batch past the stop flag; wait for
        # it without a timeout so a mid-batch device call can't leak a
        # half-processed queue (joining a daemon thread is bounded by the
        # batch wall time).
        self._worker.join()
        if self._resolver is not None:
            # The worker enqueues the drain sentinel on exit, so every
            # already-dispatched batch resolves before the join returns.
            self._resolver.join()
        # Cancel anything still queued so callers don't block forever.
        while True:
            try:
                _, fut, _ = self._queue.get_nowait()
            except queue.Empty:
                break
            if fut.cancel():
                with self._stats_lock:
                    self._stats["cancelled"] += 1

    # -- dispatcher ---------------------------------------------------------
    def _fill_window_s(self) -> float:
        """Current fill window for a partial batch: ``fill_window_frac``
        of the EMA turn time, floored at ``max_delay_s``, capped at
        ``fill_window_max_s``. Before the first measured turn the floor
        applies (the legacy behavior)."""
        return min(max(self.max_delay_s,
                       self._turn_ema_s * self.fill_window_frac),
                   self.fill_window_max_s)

    def _note_turn(self, seconds: float) -> None:
        self._turn_ema_s = (seconds if self._turn_ema_s == 0.0
                            else 0.5 * self._turn_ema_s + 0.5 * seconds)

    def _collect(self):
        items = []
        try:
            items.append(self._queue.get(timeout=0.05))
        except queue.Empty:
            return items
        # One bounded window from the FIRST item, not a per-item timeout:
        # the device is busy for a whole turn anyway, so spending a small
        # fraction of a turn here coalesces a concurrently-arriving
        # cohort into one batch instead of splitting it into partial
        # batches that each cost a full turn (the round-4 tail).
        deadline = time.monotonic() + self._fill_window_s()
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            if self._resolve_q is not None:
                # Pipelined: assemble + dispatch here (async), fetch on
                # the resolver thread, so the next batch's host work
                # overlaps this batch's device execution + fetch. The
                # permit is returned by the resolver once the batch
                # settles (or right here if dispatch itself fails).
                self._inflight.acquire()
                try:
                    handle = self._dispatch_batch(
                        [req for req, _, _ in items])
                except Exception as exc:
                    self._inflight.release()
                    self._settle_batch(items, exc=exc)
                else:
                    self._resolve_q.put((items, handle, time.monotonic()))
                continue
            t0 = time.monotonic()
            try:
                results = self._run_batch([req for req, _, _ in items])
            except Exception as exc:  # pragma: no cover - defensive
                self._settle_batch(items, exc=exc)
            else:
                self._note_turn(time.monotonic() - t0)
                self._settle_batch(items, results)
        if self._resolve_q is not None:
            self._resolve_q.put(None)  # drain sentinel for close()

    def _resolve_loop(self) -> None:
        while True:
            entry = self._resolve_q.get()
            if entry is None:
                return
            items, handle, t_dispatch = entry
            try:
                try:
                    results = self._finalize_batch(handle)
                except Exception as exc:
                    self._settle_batch(items, exc=exc)
                else:
                    # Dispatch->settled includes any resolver queue wait,
                    # which is the effective turn pacing under pipelining.
                    self._note_turn(time.monotonic() - t_dispatch)
                    self._settle_batch(items, results)
            finally:
                self._inflight.release()

    def _settle_batch(self, items, results=None, exc=None) -> None:
        """Resolve one batch's futures and update the counters."""
        now = time.monotonic()
        with self._stats_lock:
            self._stats["batches"] += 1
            self._stats["padded_slots"] += self.batch_size - len(items)
        for i, (_, fut, t0) in enumerate(items):
            if exc is not None:
                _settle(fut, exc=exc)
            else:
                _settle(fut, results[i])
            lat_ms = 1e3 * (now - t0)
            with self._stats_lock:
                if fut.cancelled():
                    self._stats["cancelled"] += 1
                elif exc is not None:
                    self._stats["failed"] += 1
                else:
                    self._stats["completed"] += 1
                    self._stats["latency_sum_ms"] += lat_ms
                    self._stats["latency_max_ms"] = max(
                        self._stats["latency_max_ms"], lat_ms)

    def _run_batch(self, requests) -> list:
        if self.mode == "mcts":
            return self._run_mcts_batch(requests)
        return self._finalize_batch(self._dispatch_batch(requests))

    def _prepare_mats(self, requests):
        """Host-side batch assembly: pad to the compiled shape and stack
        the .mat records."""
        n = len(requests)
        pad = self.batch_size - n
        padded = list(requests) + [requests[-1]] * pad

        # Per-request, not all(): a gt-less neighbor in the batch must not
        # suppress another request's PSNR (batch-composition independence).
        has_gt = ["gt" in r.mat for r in requests]
        mats = {k: np.concatenate(
            [np.asarray(r.mat[k]) for r in padded])
            for k in ("x0", "y0", "mask")}
        # gt is optional at serving time (no reference image in production);
        # the env carries zeros and the PSNR output is suppressed.
        mats["gt"] = np.concatenate(
            [np.asarray(r.mat["gt"]) if "gt" in r.mat
             else np.zeros(np.asarray(r.mat["mask"]).shape, np.float32)
             for r in padded])
        # The reference's eval dataset clips x0 at 0 before the env consumes
        # it (datasets.py:160,199); keep serving consistent with that path.
        mats["x0"] = np.clip(mats["x0"], 0, None)
        return n, padded, has_gt, mats

    def _run_mcts_batch(self, requests) -> list:
        # One device program searches the whole padded batch; a fixed
        # per-request seed keeps results independent of batch
        # composition (the trees are lockstep but isolated, tested).
        n, padded, has_gt, mats = self._prepare_mats(requests)
        recs = []
        for i, r in enumerate(padded):
            m = {k: v[i:i + 1] for k, v in mats.items()}
            recs.append(((None, np.float32(r.rtg), None,
                          np.int32(r.task)), m))
        results = self._mcts.run_batch(
            recs, seeds=[self._mcts.cfg.seed] * len(recs),
            detailed=True, verbose=False)[:n]
        return [RestorationResult(
            image=np.clip(res["image"], 0.0, 1.0),
            psnr_db=res["reward"] if has_gt[i] else None,
            episode_len=res["episode_len"])
            for i, res in enumerate(results)]

    def _dispatch_batch(self, requests):
        """Assemble + dispatch one policy/fixed batch; returns lazy device
        handles (JAX dispatch is async — nothing blocks until
        :meth:`_finalize_batch` fetches)."""
        n, padded, has_gt, mats = self._prepare_mats(requests)
        env_state = reset_from_mat(mats)
        if self.mesh is not None:
            # Shard the fixed batch over the mesh's data axis (single
            # process: a plain device_put with a NamedSharding; the jitted
            # program partitions from the input shardings).
            from dt4image_restoration_tpu.training.sharding import (
                shard_eval_inputs)
            env_state = shard_eval_inputs(env_state, self.mesh)
        else:
            shard_eval_inputs = None
        if self.mode == "policy":
            # Policy initial observation reads the UNCLIPPED x0, matching
            # the eval dataset path (reference datasets.py:160-164: the clip
            # rebinds only the env record, not the states source).
            policy_x0 = jnp.asarray(np.stack(
                [np.asarray(r.mat["x0"], np.float32)
                 [..., 0].reshape(-1) for r in padded]))
            rtg0 = jnp.asarray([r.rtg for r in padded], jnp.float32)
            task = jnp.asarray([r.task for r in padded], jnp.int32)
            if self.mesh is not None:
                policy_x0, rtg0, task = shard_eval_inputs(
                    (policy_x0, rtg0, task), self.mesh)
            images, reward, ep_len = self._program(
                self._dt_params, policy_x0, rtg0, task, env_state)
        else:
            images, reward, ep_len = self._program(env_state)

        # Slice on device BEFORE the host fetch: only the n live rows
        # cross the link, not the padding.
        return images[:n, 0], reward[:n, 0], ep_len[:n], has_gt

    def _finalize_batch(self, handle) -> list:
        """Fetch one dispatched batch's outputs and build the results."""
        images, reward, ep_len, has_gt = handle
        images = np.asarray(images)
        reward = np.asarray(reward)
        ep_len = np.asarray(ep_len)
        n = len(has_gt)
        return [RestorationResult(
            image=np.clip(images[i], 0.0, 1.0),
            psnr_db=float(reward[i]) if has_gt[i] else None,
            episode_len=int(ep_len[i])) for i in range(n)]
