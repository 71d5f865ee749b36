"""End-to-end learning validation: the full pipeline (trajectory
recording -> json/h5 dataset -> DT training -> greedy evaluation) learns a
restoration policy.

The published trajectory dataset is download-gated (reference README.md:11),
so this generates expert trajectories by rolling the REAL environment under
a scripted policy (decaying sigma_d, fixed mu, stop at step 8), writes them
in the reference's exact on-disk format (one json per trajectory + one
HDF5 of uint8 states, datasets.py:38-132), trains the Decision Transformer
on them, and evaluates greedily on held-out slices.

Success criterion: the trained policy's PSNR increment over the zero-filled
baseline approaches the scripted expert's and clearly beats the
random-init DT.

Run on TPU:  python benchmarks/policy_learning_demo.py
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

N_TRAJ = 48
EP_LEN = 8
TRAIN_STEPS = 300
BATCH = 16
HELD_OUT = 7
SEARCH_ITERS = 30
IMAGE_SIZE = 128  # smoke tests shrink this (and everything above)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.config import (
        ModelConfig, TrainerConfig, OPTIMAL_RTG_RANGE, OPTIMAL_TASKS)
    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.data.datasets import TrainingDataset
    from dt4image_restoration_tpu.data.expert import record_expert_corpus
    from dt4image_restoration_tpu.env import reset_from_mat
    from dt4image_restoration_tpu.inference import Evaluator
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.training import (
        TrainState, make_optimizer, make_train_step)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    results = {"platform": jax.devices()[0].platform,
               "tpu_unreachable": tpu_unreachable}

    den_params = convert_unet_state_dict(random_unet_state_dict(0))
    den_model = UNetDenoiser()
    denoise = lambda img, sig: den_model.apply({"params": den_params},
                                               img, sig)

    # --- record trajectories in the reference's on-disk format ----------
    # Shared recorder (data/expert.py; tools/make_dataset.py is the user
    # CLI). Single task + default 4x/noiseless physics — the controlled
    # setting this demo's learning criterion was tuned on.
    tmp = tempfile.mkdtemp(prefix="dt4ir_demo_")
    corpus = record_expert_corpus(
        tmp, denoise, n_traj=N_TRAJ, ep_len=EP_LEN, seed=0,
        size=IMAGE_SIZE, tasks=["4x_15"], physics_from_task=False)
    traj_dir, h5_path = corpus["traj_dir"], corpus["h5_path"]
    results["expert_increment_db"] = round(
        corpus["expert_increment_db"], 3)

    # --- train ------------------------------------------------------------
    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                      image_size=IMAGE_SIZE)
    lo, hi = OPTIMAL_RTG_RANGE
    ds = TrainingDataset(
        block_size=18, data_dir=traj_dir, action_dim=3,
        state_file_path=h5_path, tasks=OPTIMAL_TASKS,
        min_rtg=lo, max_rtg=hi, normalize_rtg=True,
        image_size=IMAGE_SIZE, rng=np.random.default_rng(0))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params0 = jax.device_get(init_dt_params(cfg, seed=0))
    tcfg = TrainerConfig(warmup_steps=30, learning_rate=3e-4,
                         batch_size=BATCH)
    optimizer = make_optimizer(tcfg, max_steps=TRAIN_STEPS, params=params0)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)
    state = TrainState(params=jax.tree.map(jnp.asarray, params0),
                       opt_state=optimizer.init(params0),
                       step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    steps, losses = 0, []
    epoch = 0
    while steps < TRAIN_STEPS:
        for batch in ds.batches(BATCH, seed=epoch):
            key, sub = jax.random.split(key)
            state, loss = step_fn(
                state, {k: jnp.asarray(v) for k, v in batch.items()}, sub)
            losses.append(loss)
            steps += 1
            if steps >= TRAIN_STEPS:
                break
        epoch += 1
    results["train_steps"] = steps
    results["train_wall_s"] = round(time.perf_counter() - t0, 1)
    results["loss_first10"] = round(
        float(np.mean([float(l) for l in losses[:10]])), 4)
    results["loss_last10"] = round(
        float(np.mean([float(l) for l in losses[-10:]])), 4)

    # --- evaluate on held-out slices --------------------------------------
    # Condition on the expert's achieved increment — the gain a competent
    # policy should reproduce on fresh slices.
    target = float(corpus["expert_increment_db"])
    rtg_norm = (target - lo) / (hi - lo)

    def records(n, seed0):
        out = []
        for i in range(n):
            mat = dict(make_mat_record(size=IMAGE_SIZE, seed=seed0 + i))
            states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
            mat["x0"] = np.clip(mat["x0"], 0, None)
            out.append(((states, np.full((1, 1), rtg_norm, np.float32),
                         np.zeros(3, np.float32),
                         np.asarray([OPTIMAL_TASKS.index("4x_15")],
                                    np.int32)), mat))
        return out

    recs = records(HELD_OUT, seed0=10_000)
    trained = jax.device_get(state.params)
    for tag, p in (("trained", trained), ("random_init", params0)):
        ev = Evaluator(dt_apply=make_dt_apply(cfg), dt_params=p,
                       denoise=denoise, cfg=cfg, max_timesteps=30)
        m = ev.evaluate_records(recs)
        results[f"{tag}_increment_db"] = round(
            float(np.mean(m["increment"])), 3)
        results[f"{tag}_mean_episode_len"] = float(
            np.mean(m["episode_len"]))

    # Tree search around the trained policy (device backend, proxy value
    # model): does exploring sampled (sigma_d, mu) perturbations find
    # better programs than the greedy decode? Honest either way — the
    # search optimizes the no-reference score, not PSNR.
    from dt4image_restoration_tpu.config import MCTSConfig
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
    from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
    from dt4image_restoration_tpu.env import compute_reward as _cr
    dm = DeviceMCTS(dt_apply=make_dt_apply(cfg), dt_params=trained,
                    denoise=denoise, model_cfg=cfg,
                    cfg=MCTSConfig(iterations=SEARCH_ITERS),
                    value_fn=proxy_value_fn)
    rewards = dm.run_batch(recs, seeds=list(range(HELD_OUT)),
                           verbose=False)
    baselines = [float(np.asarray(_cr(reset_from_mat(r[1])))[0, 0])
                 for r in recs]
    results["trained_mcts_increment_db"] = round(
        float(np.mean([r - b for r, b in zip(rewards, baselines)])), 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
