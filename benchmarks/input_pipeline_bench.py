"""Training input-pipeline proof at dataset scale (round-2 verdict weak #7).

Round 2 inferred "input-pipeline-bound" from the 5.5 ms fused step alone;
this bench actually assembles a realistic corpus — 410 trajectory jsons +
one HDF5 of uint8 128x128 states, the reference's dataset shape
(/root/reference/dataset/datasets.py:38-132, README "410 trajectories") —
and drives a full epoch through the SHIPPED trainer path
(TrainingDataset.batches -> background_batches -> shard_batch ->
fused donated train_step), reporting:

  * epoch_wall_s         — end-to-end epoch time through Trainer._train_loop
  * device_only_s        — the same number of steps with a resident batch
                           (pipelined dispatch; the pure-compute floor)
  * input_only_s         — iterating the host batch pipeline with no device
                           work (the pure-IO ceiling)
  * overlap_efficiency   — device_only / epoch_wall (1.0 = input assembly
                           fully hidden behind device compute)

Run on TPU:  python benchmarks/input_pipeline_bench.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_TRAJ = 410
BATCH = 48
T = 6
EPOCH_REPS = 5


def build_corpus(root: str, rng: np.random.Generator):
    """410 trajectories in the reference's json+h5 layout: lengths 8-30,
    uint8 state images, 10-char path prefix stripped to the h5 key."""
    import h5py
    data_dir = os.path.join(root, "trajs")
    h5_path = os.path.join(root, "states.h5")
    os.makedirs(data_dir, exist_ok=True)
    tasks = ["2x_5", "2x_10", "2x_15", "4x_5", "4x_10", "4x_15",
             "8x_5", "8x_10", "8x_15"]
    with h5py.File(h5_path, "w") as f:
        for i in range(N_TRAJ):
            length = int(rng.integers(8, 31))
            paths = []
            for t in range(length):
                key = f"traj{i}/state{t}"
                f.create_dataset(key, data=rng.integers(
                    0, 256, (128, 128)).astype(np.uint8))
                paths.append("0123456789" + key)
            traj = {
                "RTG": [float(v) for v in np.linspace(16, 0, length)],
                "Actions": {k: [float(v) for v in rng.uniform(0, 1, length)]
                            for k in ("T", "sigma_d", "mu")},
                "State Paths": paths,
                "Task": tasks[i % len(tasks)],
            }
            with open(os.path.join(data_dir, f"traj_{i:04d}.json"),
                      "w") as jf:
                json.dump(traj, jf)
    return data_dir, h5_path


def main() -> None:
    import jax
    # --cpu = tunnel-free control: on CPU the H2D transfer is memcpy-cheap,
    # so overlap_efficiency isolates how well background_batches hides
    # input assembly behind (slower) device compute. Without it, a dead
    # TPU probe (tunnel outage) also falls back to CPU instead of hanging.
    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()
    import jax.numpy as jnp

    from dt4image_restoration_tpu.config import (
        ModelConfig, TrainerConfig, tasks_for_experiment)
    from dt4image_restoration_tpu.data.datasets import TrainingDataset
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_mesh, make_optimizer, make_train_step,
        shard_batch)
    from dt4image_restoration_tpu.training.sharding import background_batches

    results = {"platform": jax.devices()[0].platform, "batch": BATCH,
               "tpu_unreachable": tpu_unreachable,
               "n_trajectories": N_TRAJ}
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        data_dir, h5_path = build_corpus(root, rng)
        results["corpus_build_s"] = round(time.perf_counter() - t0, 2)
        results["corpus_mb"] = round(os.path.getsize(h5_path) / 2**20, 1)

        tasks, (min_rtg, max_rtg) = tasks_for_experiment("optimal")
        cfg = ModelConfig(block_size=3 * T, n_embeds=len(tasks),
                          mode="norm")
        dataset = TrainingDataset(
            block_size=T, data_dir=data_dir, action_dim=cfg.action_dim,
            state_file_path=h5_path, tasks=tasks,
            min_rtg=min_rtg, max_rtg=max_rtg)
        t0 = time.perf_counter()
        dataset_pre = TrainingDataset(
            block_size=T, data_dir=data_dir, action_dim=cfg.action_dim,
            state_file_path=h5_path, tasks=tasks,
            min_rtg=min_rtg, max_rtg=max_rtg, preload=True)
        results["preload_upfront_s"] = round(time.perf_counter() - t0, 2)
        from dt4image_restoration_tpu.data.native_loader import (
            native_available)
        results["native_loader"] = native_available()
        steps = len(dataset) // BATCH
        results["steps_per_epoch"] = steps

        tcfg = TrainerConfig(batch_size=BATCH, max_epochs=1,
                             save_every=10**9)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = jax.device_get(init_dt_params(cfg, seed=0))
        optimizer = make_optimizer(tcfg, max_steps=steps, params=params)

        def fresh_state():
            # The fused step donates its state argument, so each timed
            # section gets its own TrainState built from the host params.
            return TrainState(params=jax.tree.map(np.copy, params),
                              opt_state=optimizer.init(params),
                              step=jnp.zeros((), jnp.int32))

        mesh = make_mesh(n_data=1, n_model=1)
        step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

        # Warm BOTH compile signatures outside the timed sections: the
        # first call sees host (numpy) state, the second the donated
        # device-resident state — each gets its own executable.
        warm = next(iter(dataset.batches(BATCH, seed=123)))
        sharded_warm = shard_batch(warm, mesh)
        s, l = step_fn(fresh_state(), sharded_warm, jax.random.PRNGKey(0))
        s, l = step_fn(s, sharded_warm, jax.random.PRNGKey(0))
        float(l)

        # The tunnel's timing variance (±40%, with multi-second drift)
        # swamps single orderings (CLAUDE.md timing rules), so the four
        # sections are INTERLEAVED round-robin and each reports its
        # MEDIAN epoch time across EPOCH_REPS rounds.
        host_batches = list(dataset.batches(BATCH, seed=99))

        def ep_input(rep):
            # (1) input-only: host pipeline, no device work.
            n_in = sum(1 for _ in background_batches(
                dataset.batches(BATCH, seed=rep)))
            assert n_in == steps, (n_in, steps)

        def ep_input_native(rep):
            # (1b) input-only through the preloaded + native-gather path
            # (data/native_loader.py): the same batches, assembled by the
            # C++ kernel from the resident uint8 cache.
            n_in = sum(1 for _ in background_batches(
                dataset_pre.batches(BATCH, seed=rep)))
            assert n_in == steps, (n_in, steps)

        def ep_device(rep):
            # (2) device-only floor: resident batch, pipelined dispatch,
            # one scalar fetch at the end.
            nonlocal s
            loss = None
            for _ in range(steps):
                s, loss = step_fn(s, sharded_warm, jax.random.PRNGKey(1))
            float(loss)

        def ep_transfer(rep):
            # (2b) transfer+step floor: pre-assembled host batches,
            # per-step shard_batch (device_put) + fused step — adds the
            # H2D transfer (18 MB/batch; dominated by the axon tunnel
            # here, PCIe-negligible on a host-attached TPU).
            nonlocal s
            loss = None
            for hb in host_batches:
                s, loss = step_fn(s, shard_batch(hb, mesh),
                                  jax.random.PRNGKey(2))
            float(loss)

        trainer = Trainer(
            train_step=step_fn, state=fresh_state(), config=tcfg,
            batches=lambda epoch: dataset.batches(BATCH, seed=epoch),
            shard=lambda b: shard_batch(b, mesh),
            checkpoint_dir=None)

        def ep_trainer(rep):
            # (3) the shipped trainer path, one epoch end-to-end (fresh
            # host assembly + background thread + transfer + fused step).
            with mesh:
                trainer.train()

        trainer_pre = Trainer(
            train_step=step_fn, state=fresh_state(), config=tcfg,
            batches=lambda epoch: dataset_pre.batches(BATCH, seed=epoch),
            shard=lambda b: shard_batch(b, mesh),
            checkpoint_dir=None)

        def ep_trainer_native(rep):
            # (3b) the same trainer epoch with --preload_data assembly.
            with mesh:
                trainer_pre.train()

        sections = {"input_only": ep_input, "input_native": ep_input_native,
                    "device_only": ep_device,
                    "transfer_step": ep_transfer, "epoch_wall": ep_trainer,
                    "epoch_native": ep_trainer_native}
        times = {k: [] for k in sections}
        for rep in range(EPOCH_REPS):
            for name, fn in sections.items():
                t0 = time.perf_counter()
                fn(rep)
                times[name].append(time.perf_counter() - t0)

        med = {k: float(np.median(v)) for k, v in times.items()}
        for k, v in med.items():
            results[f"{k}_s"] = round(v, 2)
            results[f"{k.replace('_only', '').replace('_wall', '')}"
                    f"_ms_per_step"] = round(1e3 * v / steps, 2)
        # Overlap efficiency vs the realistic floor (transfer+step): 1.0
        # means input ASSEMBLY is fully hidden behind transfer+compute.
        results["overlap_efficiency"] = round(
            med["transfer_step"] / med["epoch_wall"], 3)
        results["overlap_efficiency_native"] = round(
            med["transfer_step"] / med["epoch_native"], 3)
        results["input_bound"] = bool(
            med["input_only"] > med["transfer_step"])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
