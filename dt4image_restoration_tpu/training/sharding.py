"""Distributed training over the TPU mesh.

The lawful JAX replacement for the reference's NCCL DDP stack
(main.py:43-52, train.py:50-53, DistributedSampler main.py:62):

  * ``make_mesh`` — a (data, model) ``jax.sharding.Mesh`` over ICI
  * ``make_train_step`` — one jitted, donated update; batch sharded over the
    data axis, params replicated (or tensor-parallel over the model axis for
    the transformer MLP/attention projections); XLA GSPMD inserts the
    gradient all-reduces that DDP did explicitly
  * ``make_shard_map_train_step`` — an explicit ``shard_map`` + ``psum``
    data-parallel variant, kept as an independently-testable reference of
    the collective semantics
  * ``shard_batch`` — host batch -> device shards
    (replaces DistributedSampler)

The DT is ~1.3M params on 18-token sequences, so pure DP is the production
configuration (SURVEY.md: parallelism checklist); TP exists for scale-out
headroom and is exercised by the multichip dry run.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dt4image_restoration_tpu.training.trainer import TrainState, loss_fn

BATCH_AXES = {
    "states": P("data"), "actions": P("data"), "rtg": P("data"),
    "traj_masks": P("data"), "timesteps": P("data"), "task": P("data"),
}


# Environment markers that identify a multi-host cluster whose topology
# jax.distributed.initialize() can auto-detect with no arguments (TPU pod
# metadata, GKE megascale, Slurm, Open MPI).
_CLUSTER_ENV_MARKERS = (
    "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID",
    "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
)


def maybe_initialize_distributed() -> None:
    """Multi-process runtime init — the lawful replacement for the
    reference's ``init_process_group('nccl', MASTER_ADDR=localhost)``
    (main.py:43-52).

    Resolution order:
      1. explicit JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES,
         JAX_PROCESS_ID) — e.g. the 2-process CPU test harness;
      2. a recognized cluster environment (TPU pod / GKE / Slurm / MPI)
         -> no-arg ``jax.distributed.initialize()``, which auto-detects the
         coordinator and process topology; if auto-detection cannot resolve
         a coordinator (e.g. a single-host tunnel that still exports pod
         markers), fall back to single-process;
      3. otherwise a no-op (single-process).
    Safe to call twice (already-initialized errors are swallowed).
    """
    import logging
    import os
    try:
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        elif any(m in os.environ for m in _CLUSTER_ENV_MARKERS):
            # Opportunistic: single-host tunnels can export pod markers, and
            # a library caller may have touched the backend already — both
            # mean "run single-process", not "crash".
            try:
                jax.distributed.initialize()
            except (ValueError, KeyError, RuntimeError) as e:
                logging.getLogger(__name__).info(
                    "cluster markers present but distributed init not "
                    "possible (%s); continuing single-process", e)
    except RuntimeError as e:  # pragma: no cover - double-init guard
        if "already" not in str(e):
            raise
    if jax.process_count() > 1:
        # Eagerly establish the cross-process collective context NOW,
        # while every process is aligned at the initialize() rendezvous —
        # the analogue of NCCL communicator warmup. The backend's lazy
        # context setup has a short key-exchange deadline (~30 s on the
        # CPU Gloo path); deferring it to the first real dispatch makes it
        # race against minutes of per-host skew from model init /
        # compilation, which deadlocked the CLI on a timeshared host
        # (observed: rank 0 timed out in Gloo init while rank 1 was still
        # tracing the model).
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(np.zeros((1,), np.float32))


def background_batches(iterator, size: int = 2):
    """Run a host batch iterator (file reads, window crops) on a background
    thread with a bounded queue, so input assembly overlaps device compute —
    the upgrade over the reference's num_workers=0 DataLoader
    (main.py:33,55-69)."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def bounded_put(item):
        # Bounded-wait put so an abandoned consumer (early exit on
        # preemption) releases this thread instead of leaking it blocked
        # on a full queue.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not bounded_put(item):
                    return
            bounded_put(_END)
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            # A corrupt file / missing h5 key must FAIL the epoch, not
            # silently truncate it (the consumer re-raises).
            bounded_put(exc)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def prefetch_shard(iterator, shard_fn, size: int = 2):
    """Host->device double-buffered prefetch: ``shard_fn`` (an async
    ``device_put``) is issued ``size`` batches ahead, so the next batch's
    H2D transfer overlaps the current step's compute (the TPU analogue of
    DataLoader pin_memory + async H2D, main.py:55-69)."""
    import collections
    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            batch = next(iterator, None)
            if batch is None:
                return
            queue.append(shard_fn(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """``prefetch_shard`` specialised to ``shard_batch`` over ``mesh``."""
    return prefetch_shard(iterator, lambda b: shard_batch(b, mesh), size)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def param_partition_spec(params, tensor_parallel: bool) -> Any:
    """PartitionSpecs for the DT param tree: replicated by default; with
    ``tensor_parallel`` the transformer MLP and attention projections shard
    Megatron-style over the model axis (column-parallel fc/qkv,
    row-parallel proj)."""
    def spec(path, leaf):
        if not tensor_parallel:
            return P()
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "kernel" in names and leaf.ndim == 2:
            if any(n in ("fc", "qkv_proj") for n in names):
                return P(None, "model")
            if any(n in ("fc_proj", "o_proj") for n in names):
                return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = False):
    specs = param_partition_spec(params, tensor_parallel)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


_SYNC_COUNTER = [0]


def sync_processes(tag: str = "eval") -> None:
    """Align all processes at a coordination-service barrier (gRPC — the
    waiting side SLEEPS). Called before multi-process inference dispatches
    so that no process starts busy-polling a device collective while
    another is still deep in per-host work (model init, tracing): on a
    timeshared host the poller otherwise starves the straggler into a
    live-lock (observed on the CLI eval path). Cost on a real pod: one
    sub-millisecond RPC per batched dispatch. No-op single-process.

    Barrier names are sequenced by a process-local counter, so the SPMD
    contract applies: a process that raises between matched dispatches
    must EXIT (letting the coordination service fail the job), not catch
    and continue — continuing desyncs the sequence and every later
    barrier times out. The timeout error below names the barrier and
    this cause so the hang is diagnosable."""
    if jax.process_count() <= 1:
        return
    from jax._src.distributed import global_state
    if global_state.client is None:  # runtime without a coordination svc
        return
    _SYNC_COUNTER[0] += 1
    name = f"dt4ir_{tag}_{_SYNC_COUNTER[0]}"
    try:
        global_state.client.wait_at_barrier(name, timeout_in_ms=600_000)
    except Exception as e:
        raise RuntimeError(
            f"multi-process barrier '{name}' failed: {e}. A barrier "
            f"timeout here usually means another process raised or "
            f"skipped a dispatch and the per-process barrier sequence "
            f"desynced — a rank that fails mid-sequence must exit, not "
            f"catch and continue.") from e


def shard_eval_inputs(tree, mesh: Mesh, spec: P = P("data")):
    """Shard a pytree of batched inference inputs over the mesh's data
    axis, multi-host aware: on a pod each process passes only ITS slice of
    the global batch (``make_array_from_process_local_data``, like
    :func:`shard_batch`); single-process falls back to a plain
    ``device_put``. ``spec`` names the batch axis position (default:
    leading). Used by the Evaluator and the tree-search backends.

    Entry to every multi-process inference dispatch — aligns processes
    first (:func:`sync_processes`)."""
    sync_processes("shard_eval")
    def put(x):
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def gather_eval_outputs(tree, mesh: Optional[Mesh] = None):
    """Fetch inference outputs to host numpy, multi-host aware: globally
    sharded outputs are allgathered so every process sees the full batch
    (the reporting/aggregation side of the reference's per-image prints);
    single-process is a plain device_get.

    The collective path is gated on BOTH a multi-process runtime AND a
    ``mesh``: an Evaluator/DeviceMCTS constructed with ``mesh=None`` inside
    a multi-process job (e.g. a per-host serving queue) holds process-local
    arrays — issuing cross-process collectives from its asynchronous calls
    would deadlock the pod.
    """
    if mesh is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return jax.tree.map(
            lambda x: np.asarray(multihost_utils.process_allgather(
                x, tiled=True)), tree)
    return jax.tree.map(np.asarray, tree)


def local_output_offset(n_local_padded: int,
                        mesh: Optional[Mesh] = None) -> int:
    """This process's row offset into gathered global outputs.

    The offset arithmetic (``process_index * local_count``) is only valid
    when every process submitted the SAME padded local count — asserted
    here with an allgather so a mismatched split fails loudly instead of
    silently misattributing another process's results. Single-process (or
    ``mesh=None``, i.e. process-local inference in a multi-process job): 0.
    """
    if mesh is None or jax.process_count() <= 1:
        return 0
    from jax.experimental import multihost_utils
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([n_local_padded])))
    counts = counts.reshape(-1)
    if not (counts == n_local_padded).all():
        raise ValueError(
            f"multi-host inference needs equal per-process record counts; "
            f"got {counts.tolist()} (pad every process to the same "
            f"length)")
    return jax.process_index() * n_local_padded


def padded_per_process(n_global: int, mesh: Mesh) -> int:
    """Per-process slice length when a GLOBAL record list is sharded into
    equal contiguous process slices: ceil(n_global / n_proc), rounded up
    to this process's share of the mesh data axis (so every local batch
    shards evenly). The single source of the layout contract between the
    global-sharding entry points (Evaluator.run, DeviceMCTS.
    run_global_batches) and the gathered-row reassembly they perform —
    callers wrap-pad the global list to ``n_proc * padded_per_process``.
    """
    n_proc = jax.process_count()
    per = -(-n_global // n_proc)
    unit = max(1, mesh.shape["data"] // n_proc)
    return per + (-per) % unit


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh
                ) -> Dict[str, jnp.ndarray]:
    """Place a host batch with the leading axis sharded over 'data'.

    Single-process: a plain sharded device_put. Multi-process: each host
    passes only ITS shard of the global batch and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    the lawful equivalent of DistributedSampler feeding per-rank loaders
    (reference main.py:62); no host ever materializes the global batch.
    """
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    NamedSharding(mesh, BATCH_AXES[k]), np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(np.asarray(v),
                              NamedSharding(mesh, BATCH_AXES[k]))
            for k, v in batch.items()}


def make_train_step(dt_apply: Callable, optimizer: optax.
                    GradientTransformation) -> Callable:
    """One fused update: forward, masked MSE, backward, clip, AdamW — the
    whole `_run_batch` body (train.py:75-119) as a single donated XLA
    program. Gradient cross-device reduction is inserted by GSPMD from the
    batch/param shardings."""
    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(dt_apply, p, batch, rng))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))


def make_shard_map_train_step(dt_apply: Callable,
                              optimizer: optax.GradientTransformation,
                              mesh: Mesh) -> Callable:
    """Explicit-collective data-parallel step: per-shard grads + ``psum``
    over the data axis, optimizer applied to replicated params — the direct
    analogue of DDP's bucketed all-reduce (train.py:53,96)."""
    def per_shard(params, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(dt_apply, p, batch, rng))(params)
        # Per-shard masked means are weighted by each shard's valid-position
        # count so the psum equals the global masked mean.
        weight = jnp.sum(batch["traj_masks"]) * batch["actions"].shape[-1] \
            + jnp.sum(batch["traj_masks"])
        total_w = jax.lax.psum(weight, "data")
        scale = weight / total_w
        grads = jax.lax.psum(jax.tree.map(lambda g: g * scale, grads),
                             "data")
        loss = jax.lax.psum(loss * scale, "data")
        return grads, loss

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), BATCH_AXES, P()),
        out_specs=(P(), P()))

    def step(state: TrainState, batch, rng):
        grads, loss = mapped(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))
