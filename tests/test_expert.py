"""data/expert.py + tools/make_dataset.py: the scripted-expert corpus
generator (out-of-the-box train/eval data — the reference's sets are
email-/download-gated, reference README.md:9-39). Layout compatibility is
pinned by consuming the output through the real TrainingDataset /
EvaluationOptimalDataset readers; the learning-quality criterion lives in
tests/test_learning.py (which records through the same module)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from dt4image_restoration_tpu.config import (
    OPTIMAL_RTG_RANGE, OPTIMAL_TASKS)
from dt4image_restoration_tpu.data.datasets import TrainingDataset
from dt4image_restoration_tpu.data.expert import (
    make_eval_dirs, record_expert_corpus, task_physics)


def stub_denoise(img, sigma):
    del sigma
    return jnp.clip(img, 0.0, 1.0)


def test_task_physics_parsing():
    assert task_physics("2x_5") == (2, 5.0)
    assert task_physics("8x_15") == (8, 15.0)
    assert task_physics("4_10") == (4, 10.0)      # eval-dir form
    assert task_physics("rtg_3.5") == (4, 15.0)   # flex fallback


def test_record_expert_corpus_feeds_training_dataset(tmp_path):
    """The recorded corpus round-trips through the REAL TrainingDataset
    reader: per-task physics, 10-char path prefix convention, RTG
    increment-to-go, action keys, padding/mask for episodes shorter than
    the context window."""
    stats = record_expert_corpus(
        str(tmp_path), stub_denoise, n_traj=3, ep_len=2, seed=0,
        experiment="optimal")
    assert stats["n_traj"] == 3
    assert os.path.exists(stats["h5_path"])

    files = sorted(os.listdir(stats["traj_dir"]))
    assert len(files) == 3
    with open(os.path.join(stats["traj_dir"], files[0])) as f:
        traj = json.load(f)
    # Tasks cycle the optimal vocab; RTG is increment-to-go (first entry
    # = full episode gain, final-step entry >= 0 by construction).
    assert traj["Task"] in OPTIMAL_TASKS
    assert set(traj["Actions"]) == {"T", "sigma_d", "mu"}
    assert len(traj["RTG"]) == 2
    assert all(p.startswith("0123456789traj") for p in traj["State Paths"])

    lo, hi = OPTIMAL_RTG_RANGE
    ds = TrainingDataset(
        block_size=6, data_dir=stats["traj_dir"], action_dim=3,
        state_file_path=stats["h5_path"], tasks=OPTIMAL_TASKS,
        min_rtg=lo, max_rtg=hi, normalize_rtg=True,
        rng=np.random.default_rng(0))
    assert len(ds) == 3
    states, actions, rtg, masks, timesteps, task = ds[0]
    assert states.shape == (6, 128 * 128)
    assert actions.shape == (6, 3)
    # ep_len=2 < block 6 -> zero-padded with a trailing-masked traj_mask.
    np.testing.assert_array_equal(masks[:, 0], [1, 1, 0, 0, 0, 0])


def test_make_eval_dirs_feed_eval_dataset(tmp_path):
    """Eval dirs come out in the CLI's default vanilla/{A}_{S} layout and
    load through the real .mat reader incl. filename task extraction."""
    from dt4image_restoration_tpu.data.datasets import (
        EvaluationOptimalDataset)
    dirs = make_eval_dirs(str(tmp_path), per_dir=2, dirs=["4_15", "2_5"])
    assert [os.path.basename(os.path.normpath(d)) for d in dirs] == [
        "4_15", "2_5"]
    assert all("evaluation/image_dir/vanilla" in d for d in dirs)

    ds = EvaluationOptimalDataset(dirs[0], rtg_target=10.0)
    assert len(ds) == 2
    (states, rtg, actions0, task), mat = ds[0]
    assert int(task[0]) == OPTIMAL_TASKS.index("4x_15")
    assert mat["gt"].shape == (1, 128, 128)
    # 2x acceleration keeps more k-space than 8x would; just pin the mask
    # is non-trivial and binary.
    assert 0 < mat["mask"].mean() < 1


def test_make_dataset_cli(tmp_path, monkeypatch, capsys):
    """tools/make_dataset.py end-to-end (stub prior): one JSON line with
    corpus paths, expert increment, and the requested eval dirs."""
    import tools.make_dataset as tool
    from dt4image_restoration_tpu.utils import loaders

    monkeypatch.setattr(loaders, "load_denoiser",
                        lambda *a, **k: stub_denoise)
    rc = tool.main(["--out", str(tmp_path / "synth"), "--n_traj", "2",
                    "--ep_len", "2", "--eval", "--per_dir", "1", "--cpu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_traj"] == 2
    assert len(out["eval_dirs"]) == 9
    for d in out["eval_dirs"]:
        assert len(os.listdir(d)) == 1
    assert os.path.exists(out["h5_path"])


def test_batched_recording_matches_sequential_rollout(tmp_path):
    """The corpus recorder rolls batched scanned episodes; per-trajectory
    output must match the sequential single-record API (rollout_expert)
    up to conv-batching float reassociation (uint8 states within 1 LSB)."""
    import h5py
    import jax

    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.data.expert import rollout_expert
    from dt4image_restoration_tpu.env import admm_step

    stats = record_expert_corpus(
        str(tmp_path), stub_denoise, n_traj=3, ep_len=3, seed=0,
        experiment="optimal", batch_chunk=2)  # chunk boundary at traj 2

    step = jax.jit(lambda s, a: admm_step(stub_denoise, s, a))
    for i, task in enumerate(["2x_5", "2x_10", "2x_15"]):
        from dt4image_restoration_tpu.data.expert import task_physics
        acc, noise = task_physics(task)
        mat = dict(make_mat_record(acceleration=acc, noise_sigma=noise,
                                   seed=i))
        mat["x0"] = np.clip(mat["x0"], 0, None)
        obs, actions, psnrs = rollout_expert(step, mat, 3)

        with open(os.path.join(stats["traj_dir"], f"traj_{i}.json")) as f:
            traj = json.load(f)
        assert traj["Task"] == task
        np.testing.assert_allclose(
            traj["RTG"], [psnrs[-1] - p for p in psnrs[:3]], atol=2e-3)
        for k in ("T", "sigma_d", "mu"):
            np.testing.assert_allclose(
                traj["Actions"][k], [a[k] for a in actions], rtol=1e-6)
        with h5py.File(stats["h5_path"], "r") as f:
            for t, ob in enumerate(obs):
                ref = (np.clip(ob.reshape(128, 128), 0, 1)
                       * 255).astype(np.uint8)
                got = f[f"traj{i}/s{t}"][:]
                assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_flex_corpus_labels_encode_achieved_gain(tmp_path):
    """Flex task tokens condition on the DESIRED increment at eval time,
    so the recorded label must encode the trajectory's ACHIEVED increment
    (nearest rtg_* bucket) — a round-robin label would make the flex
    conditioning pure noise."""
    from dt4image_restoration_tpu.config import FLEX_TASKS

    stats = record_expert_corpus(
        str(tmp_path), stub_denoise, n_traj=4, ep_len=2, seed=0,
        experiment="flex")
    for i in range(4):
        with open(os.path.join(stats["traj_dir"], f"traj_{i}.json")) as f:
            traj = json.load(f)
        gain = traj["RTG"][0]  # increment-to-go at step 0 == episode gain
        expected = min(FLEX_TASKS,
                       key=lambda t: abs(float(t.split("_", 1)[1]) - gain))
        assert traj["Task"] == expected


def test_rerun_clears_stale_trajectories(tmp_path):
    """Re-recording into the same root with fewer trajectories must not
    leave stale jsons referencing h5 keys the rewrite deleted — but only
    the recorder's OWN traj_N.json files may be wiped (a foreign corpus
    sharing the layout must survive)."""
    record_expert_corpus(str(tmp_path), stub_denoise, n_traj=3, ep_len=2)
    foreign = os.path.join(str(tmp_path), "trajs", "real_corpus_0.json")
    with open(foreign, "w") as f:
        f.write("{}")
    stats = record_expert_corpus(str(tmp_path), stub_denoise, n_traj=1,
                                 ep_len=2)
    assert sorted(os.listdir(stats["traj_dir"])) == [
        "real_corpus_0.json", "traj_0.json"]


def test_flex_labeling_applies_to_explicit_rtg_vocab(tmp_path):
    """Passing the flex vocabulary explicitly via tasks= must behave like
    the default: rtg_* names carry no physics, so labels still encode the
    achieved gain (round-robin would silently revert the conditioning to
    noise)."""
    from dt4image_restoration_tpu.config import FLEX_TASKS

    stats = record_expert_corpus(
        str(tmp_path), stub_denoise, n_traj=3, ep_len=2, seed=0,
        experiment="flex", tasks=list(FLEX_TASKS))
    for i in range(3):
        with open(os.path.join(stats["traj_dir"], f"traj_{i}.json")) as f:
            traj = json.load(f)
        gain = traj["RTG"][0]
        expected = min(FLEX_TASKS,
                       key=lambda t: abs(float(t.split("_", 1)[1]) - gain))
        assert traj["Task"] == expected


def test_eval_dirs_rerun_clears_stale_records(tmp_path):
    """Regenerating an eval dir with a smaller per_dir must not leave
    higher-index records from the previous run (the evaluator averages
    the first seven per dir — a mixed-seed aggregate would be silently
    wrong); foreign .mat files are preserved."""
    from dt4image_restoration_tpu.data.expert import make_eval_dirs

    (full,) = make_eval_dirs(str(tmp_path), per_dir=3, dirs=["4_15"],
                             size=32, seed=0)
    with open(os.path.join(full, "real_slice.mat"), "wb") as f:
        f.write(b"\x00")
    make_eval_dirs(str(tmp_path), per_dir=1, dirs=["4_15"], size=32,
                   seed=1)
    assert sorted(os.listdir(full)) == ["img_4_15_s0.mat",
                                       "real_slice.mat"]
