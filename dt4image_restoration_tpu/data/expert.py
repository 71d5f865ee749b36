"""Scripted-expert corpus recording — out-of-the-box training data.

The reference's trajectory dataset is email-gated (reference README.md:11)
and its eval `.mat` sets are download-gated, so a fresh checkout of the
reference cannot run `train` at all. This module generates BOTH in the
reference's exact on-disk layouts by rolling the real PnP-ADMM environment
under a scripted expert policy:

* training corpus — one JSON per trajectory (``RTG`` increment-to-go,
  ``Actions`` dict of the three hyperparameter series, ``State Paths`` into
  a shared HDF5 of uint8 observations, ``Task``), matching what
  ``TrainingDataset`` / the reference's dataset reader consume
  (reference dataset/datasets.py:38-132);
* evaluation directories — ``evaluation/image_dir/vanilla/{acc}_{noise}/
  img_{acc}_{noise}_s{i}.mat`` records (x0/y0/mask/ATy0/gt), the layout the
  eval/flex/mcts CLI modes expect (reference main.py:225-227,
  datasets.py:153-160 schema).

For the "optimal" experiment the task name parameterizes the physics:
``{A}x_{S}`` -> A-fold undersampling, S/255 k-space noise — so the nine
task tokens correspond to genuinely different inverse problems, as in the
published sets. ``benchmarks/policy_learning_demo.py`` validates end-to-end
that a DT trained on this corpus recovers the expert's PSNR increment.

CLI: ``python tools/make_dataset.py``.
"""
from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from dt4image_restoration_tpu.config import IMAGE_SIZE, tasks_for_experiment
from dt4image_restoration_tpu.data.synthetic import make_mat_record

ACTION_KEYS = ("T", "sigma_d", "mu")


def scripted_expert_action(t: int, ep_len: int) -> Dict[str, float]:
    """Hand-tuned restoration schedule: denoiser strength decays from
    25/255 as the iterate cleans up, data-consistency weight fixed at 0.5,
    stop (T > 0.5, env.py:79-83) on the final step."""
    if t == ep_len - 1:
        return {"T": 0.9, "sigma_d": 8 / 255.0, "mu": 0.5}
    return {"T": 0.02 * t, "sigma_d": (25.0 - 2.0 * t) / 255.0, "mu": 0.5}


def task_physics(task: str) -> Tuple[int, float]:
    """(acceleration, noise_sigma) encoded by an optimal-experiment task
    name ``{A}x_{S}`` / eval dir name ``{A}_{S}``; flex tasks (``rtg_*``)
    fall back to the 4x/15 default physics."""
    m = re.fullmatch(r"(\d+)x?_(\d+(?:\.\d+)?)", task)
    if m is None:
        return 4, 15.0
    return int(m.group(1)), float(m.group(2))


def rollout_expert(step_fn: Callable, mat: Dict[str, np.ndarray],
                   ep_len: int,
                   expert_fn: Callable[[int, int], Dict[str, float]]
                   = scripted_expert_action):
    """Roll the scripted expert in the real environment.

    ``step_fn(state, action_dict_of_(1,)-arrays) -> state`` — pass a jitted
    ``admm_step`` closure. ``expert_fn(t, ep_len) -> action dict`` defaults
    to :func:`scripted_expert_action`. Returns ``(obs, actions, psnrs)``
    where ``obs`` has one flattened policy observation per acted step and
    ``psnrs`` has ``ep_len + 1`` entries (initial + after each step).
    """
    import jax.numpy as jnp

    from dt4image_restoration_tpu.env import (
        compute_reward, get_policy_ob, reset_from_mat)

    state = reset_from_mat(mat)
    obs = [np.asarray(get_policy_ob(state))[0]]
    psnrs = [float(np.asarray(compute_reward(state))[0, 0])]
    actions: List[Dict[str, float]] = []
    for t in range(ep_len):
        a = expert_fn(t, ep_len)
        actions.append(a)
        state = step_fn(state, {k: jnp.full((1,), v, jnp.float32)
                                for k, v in a.items()})
        psnrs.append(float(np.asarray(compute_reward(state))[0, 0]))
        if t < ep_len - 1:
            obs.append(np.asarray(get_policy_ob(state))[0])
    return obs, actions, psnrs


def record_expert_corpus(root: str, denoise: Callable, *,
                         n_traj: int = 64, ep_len: int = 8,
                         experiment: str = "optimal", seed: int = 0,
                         size: int = IMAGE_SIZE,
                         tasks: Optional[List[str]] = None,
                         physics_from_task: bool = True,
                         expert_fn: Callable[[int, int], Dict[str, float]]
                         = scripted_expert_action,
                         batch_chunk: int = 128,
                         progress: Optional[Callable[[str], None]] = None,
                         ) -> Dict[str, object]:
    """Write ``<root>/trajs/*.json`` + ``<root>/states.h5``.

    ``denoise(img, sigma)`` is the plug-in prior (e.g. a ``UNetDenoiser``
    apply closure). Trajectories cycle through ``tasks`` (default: the
    experiment's vocab); with ``physics_from_task`` each task's
    undersampling/noise comes from :func:`task_physics`, so the corpus
    spans all nine (or six) conditions — disable it to keep the default
    4x/noiseless physics under any task label (the single-condition
    setting benchmarks/policy_learning_demo.py pins its learning result
    on). Returns stats including the expert's mean PSNR increment — the
    target a trained policy should recover.

    With an ``rtg_*`` vocabulary (the flex default, or passed explicitly)
    the task token must encode the trajectory's ACHIEVED increment — at
    eval time the token is derived from the desired increment
    (datasets.py flex tokenization), so a label uncorrelated with the
    outcome would make the conditioning pure noise. Flex recording
    therefore cycles the nine optimal physics conditions for difficulty
    spread (unless ``physics_from_task`` is off) and labels each
    trajectory post hoc with the nearest ``rtg_*`` bucket to its
    measured gain.

    Recording is batched: ``expert_fn`` depends only on the step index, so
    episodes roll ``batch_chunk`` trajectories at a time as one scanned
    device program (per-trajectory output matches :func:`rollout_expert`
    up to conv-batching float reassociation).
    """
    import h5py
    import jax

    if tasks is None:
        tasks, _ = tasks_for_experiment(experiment)
    # A flex-style rtg_* vocabulary (default OR passed explicitly) always
    # labels by achieved gain: an rtg_* name carries no physics, and a
    # round-robin rtg_* label would be uncorrelated with the outcome it
    # is supposed to encode.
    label_by_gain = all(str(t).startswith("rtg_") for t in tasks)
    traj_dir = os.path.join(root, "trajs")
    os.makedirs(traj_dir, exist_ok=True)
    # A rerun into the same --out with a smaller n_traj would otherwise
    # leave stale trajectory jsons pointing at h5 keys the 'w'-mode
    # states.h5 rewrite just deleted. Only THIS recorder's traj_N.json
    # files are removed — a directory holding a foreign (e.g. the
    # download-gated real) corpus must not be wiped.
    for stale in os.listdir(traj_dir):
        if re.fullmatch(r"traj_\d+\.json", stale):
            os.remove(os.path.join(traj_dir, stale))
    h5_path = os.path.join(root, "states.h5")

    # The scripted schedule is the SAME for every trajectory, so the whole
    # corpus rolls as batched scanned episodes — one compiled program and
    # ONE device round-trip per `batch_chunk` trajectories, instead of
    # n_traj * ep_len host-synced dispatches (the tunnel RTT alone would
    # otherwise dominate recording).
    import jax.numpy as jnp

    from dt4image_restoration_tpu.env import (
        admm_step, compute_reward, get_policy_ob, reset_from_mat)

    sched = [expert_fn(t, ep_len) for t in range(ep_len)]
    act_seq = {k: jnp.asarray([a[k] for a in sched], jnp.float32)
               for k in ACTION_KEYS}

    @jax.jit
    def run_chunk(state):
        def body(s, a):
            s2 = admm_step(denoise, s, a)
            return s2, (get_policy_ob(s2), compute_reward(s2)[:, 0])
        _, (obs, psnrs) = jax.lax.scan(body, state, act_seq)
        return (get_policy_ob(state), compute_reward(state)[:, 0],
                obs, psnrs)

    gains: List[float] = []
    with h5py.File(h5_path, "w") as f:
        for lo in range(0, n_traj, batch_chunk):
            idx = list(range(lo, min(lo + batch_chunk, n_traj)))
            chunk_tasks, mats = [], []
            for i in idx:
                if label_by_gain:
                    # Physics can't come from an rtg_* name: cycle the
                    # optimal conditions for spread; the label is decided
                    # from the measured gain below.
                    from dt4image_restoration_tpu.config import (
                        OPTIMAL_TASKS)
                    chunk_tasks.append(None)
                    acc, noise = (task_physics(
                        OPTIMAL_TASKS[i % len(OPTIMAL_TASKS)])
                        if physics_from_task else (4, 0.0))
                else:
                    task = tasks[i % len(tasks)]
                    chunk_tasks.append(task)
                    acc, noise = (task_physics(task) if physics_from_task
                                  else (4, 0.0))
                mat = dict(make_mat_record(size=size, acceleration=acc,
                                           noise_sigma=noise,
                                           seed=seed + i))
                mat["x0"] = np.clip(mat["x0"], 0, None)
                mats.append(mat)
            stacked = {k: np.concatenate([m[k] for m in mats])
                       for k in ("x0", "y0", "mask", "gt")}
            ob0, p0, obs, psnrs = map(np.asarray,
                                      run_chunk(reset_from_mat(stacked)))
            for j, i in enumerate(idx):
                # Observation at the final acted step is never consumed
                # (the episode ends there), matching rollout_expert.
                traj_obs = [ob0[j]] + [obs[t, j] for t in range(ep_len - 1)]
                traj_psnrs = [float(p0[j])] + [float(psnrs[t, j])
                                               for t in range(ep_len)]
                gain = traj_psnrs[-1] - traj_psnrs[0]
                gains.append(gain)
                task_label = chunk_tasks[j]
                if task_label is None:  # flex: nearest rtg_* bucket
                    task_label = min(
                        tasks,
                        key=lambda t: abs(float(t.split("_", 1)[1]) - gain))
                paths = []
                for t, ob in enumerate(traj_obs):
                    key = f"traj{i}/s{t}"
                    img = np.clip(ob.reshape(size, size), 0, 1)
                    f.create_dataset(key, data=(img * 255).astype(np.uint8))
                    # The reference's reader drops a 10-char path prefix
                    # to form the h5 key (datasets.py:49-54) — reproduce
                    # that layout so either framework can consume the
                    # corpus.
                    paths.append("0123456789" + key)
                traj = {
                    "RTG": [traj_psnrs[-1] - p for p in traj_psnrs[:ep_len]],
                    "Actions": {k: [float(a[k]) for a in sched]
                                for k in ACTION_KEYS},
                    "State Paths": paths,
                    "Task": task_label,
                }
                with open(os.path.join(traj_dir, f"traj_{i}.json"),
                          "w") as jf:
                    json.dump(traj, jf)
            if progress:
                progress(f"recorded {idx[-1] + 1}/{n_traj} trajectories")
    return {"traj_dir": traj_dir, "h5_path": h5_path, "n_traj": n_traj,
            "ep_len": ep_len, "experiment": experiment,
            "expert_increment_db": float(np.mean(gains))}


def make_eval_dirs(root: str, *, per_dir: int = 7,
                   dirs: Optional[List[str]] = None,
                   size: int = IMAGE_SIZE, seed: int = 0) -> List[str]:
    """Write the nine ``evaluation/image_dir/vanilla/{A}_{S}/`` eval
    directories (default: ``config.EVAL_DIR_TOKENS``, the same constant
    the CLI's default dir list derives from) of ``.mat`` records under
    ``root`` — the exact layout the eval/flex/mcts modes scan (reference
    main.py:225-227). ``per_dir`` defaults to 7 because the evaluator
    averages the first seven images per dir (reference eval.py:137-143)."""
    import zlib

    from scipy.io import savemat

    from dt4image_restoration_tpu.config import EVAL_DIR_TOKENS

    dirs = list(EVAL_DIR_TOKENS) if dirs is None else dirs
    out = []
    for d in dirs:
        acc, noise = task_physics(d)
        # Name-keyed seed block: collision-free across arbitrary dir
        # lists (an arithmetic mix of acc+noise is not injective) and
        # stable under list reordering.
        base = seed + (zlib.crc32(d.encode()) % 1_000_003) * 1000
        full = os.path.join(root, "evaluation", "image_dir", "vanilla", d)
        os.makedirs(full, exist_ok=True)
        # A rerun with a smaller per_dir/different seed must not leave
        # higher-index records from the previous run (the evaluator
        # averages the first seven per dir — mixed-seed aggregates would
        # be silently wrong). Only THIS generator's img_{d}_sN.mat
        # pattern is removed; foreign .mat records are preserved.
        for stale in os.listdir(full):
            if re.fullmatch(rf"img_{re.escape(d)}_s\d+\.mat", stale):
                os.remove(os.path.join(full, stale))
        for i in range(per_dir):
            rec = make_mat_record(size=size, acceleration=acc,
                                  noise_sigma=noise, seed=base + i)
            savemat(os.path.join(full, f"img_{d}_s{i}.mat"), rec)
        out.append(full)
    return out
