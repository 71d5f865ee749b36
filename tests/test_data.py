"""Dataset tests on synthetic json/h5/mat fixtures (SURVEY.md §4 item 4):
window cropping, zero-pad + masks, task tokenization, RTG normalization."""
import json
import os

import h5py
import numpy as np
import pytest
from scipy.io import loadmat, savemat

from dt4image_restoration_tpu.config import (
    FLEX_TASKS, OPTIMAL_RTG_RANGE, OPTIMAL_TASKS)
from dt4image_restoration_tpu.data import (
    EvaluationDataset, TrainingDataset, extract_task, make_mat_record)


@pytest.fixture
def traj_dir(tmp_path, rng):
    """Synthetic trajectory jsons + h5 states matching the reference layout
    (datasets.py:49-54,85-132): state paths whose first 10 chars are
    stripped to form the h5 key."""
    h5_path = tmp_path / "states.h5"
    data_dir = tmp_path / "trajs"
    os.makedirs(data_dir)
    with h5py.File(h5_path, "w") as f:
        for traj_idx, length in enumerate([4, 6, 9]):
            paths = []
            for t in range(length):
                key = f"traj{traj_idx}/state{t}"
                f.create_dataset(
                    key, data=rng.integers(0, 256, (128, 128)).astype(
                        np.uint8))
                paths.append("0123456789" + key)  # 10-char prefix stripped
            traj = {
                "RTG": list(np.linspace(5, 0, length)),
                "Actions": {
                    "T": list(rng.uniform(0, 1, length)),
                    "sigma_d": list(rng.uniform(0, 1, length)),
                    "mu": list(rng.uniform(0, 1, length)),
                },
                "State Paths": paths,
                "Task": "4x_10",
            }
            with open(data_dir / f"traj_{traj_idx}.json", "w") as jf:
                json.dump(traj, jf)
    return str(data_dir), str(h5_path)


def _make_ds(traj_dir, block_size=6, normalize=True):
    data_dir, h5_path = traj_dir
    lo, hi = OPTIMAL_RTG_RANGE
    return TrainingDataset(
        block_size=block_size, data_dir=data_dir, action_dim=3,
        state_file_path=h5_path, tasks=OPTIMAL_TASKS,
        min_rtg=lo, max_rtg=hi, normalize_rtg=normalize,
        rng=np.random.default_rng(0))


def test_training_shapes_and_padding(traj_dir):
    ds = _make_ds(traj_dir)
    assert len(ds) == 3
    # traj 0 has length 4 < block 6 -> zero-pad + mask.
    states, actions, rtg, masks, timesteps, task = ds[0]
    assert states.shape == (6, 128 * 128)
    assert actions.shape == (6, 3)
    assert rtg.shape == (6, 1) and masks.shape == (6, 1)
    np.testing.assert_array_equal(masks[:, 0], [1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(states[4:], 0)
    np.testing.assert_array_equal(actions[4:], 0)
    np.testing.assert_array_equal(timesteps[:, 0], np.arange(6))
    np.testing.assert_array_equal(task, OPTIMAL_TASKS.index("4x_10"))


def test_training_exact_length_window(traj_dir):
    ds = _make_ds(traj_dir)
    # traj 1 has length 6 == block -> start 0, full mask.
    _, _, _, masks, timesteps, _ = ds[1]
    np.testing.assert_array_equal(masks[:, 0], 1)
    np.testing.assert_array_equal(timesteps[:, 0], np.arange(6))


def test_training_window_crop(traj_dir):
    ds = _make_ds(traj_dir)
    # traj 2 has length 9 > block 6 -> random window, timesteps offset.
    _, _, _, masks, timesteps, _ = ds[2]
    np.testing.assert_array_equal(masks[:, 0], 1)
    start = int(timesteps[0, 0])
    assert 0 <= start < 3
    np.testing.assert_array_equal(timesteps[:, 0],
                                  np.arange(start, start + 6))


def test_training_rtg_normalization(traj_dir):
    lo, hi = OPTIMAL_RTG_RANGE
    raw = _make_ds(traj_dir, normalize=False)[1][2]
    norm = _make_ds(traj_dir, normalize=True)[1][2]
    np.testing.assert_allclose(norm, (raw - lo) / (hi - lo), rtol=1e-5)


def test_training_states_normalized_by_255(traj_dir):
    states, *_ = _make_ds(traj_dir)[1]
    assert states.max() <= 1.0 and states.min() >= 0.0


def test_training_batches(traj_dir):
    ds = _make_ds(traj_dir)
    batches = list(ds.batches(batch_size=2, seed=0))
    assert len(batches) == 1  # 3 trajs, drop remainder
    b = batches[0]
    assert b["states"].shape == (2, 6, 128 * 128)
    assert b["task"].shape == (2, 6)


def test_extract_task():
    assert extract_task("file_4_15_slice3.mat") == "4_15"
    assert extract_task("8_5.mat") == "8_5"
    with pytest.raises(ValueError):
        extract_task("nopattern.mat")


@pytest.fixture
def mat_dir(tmp_path):
    d = tmp_path / "4_15"
    os.makedirs(d)
    for i in range(2):
        savemat(d / f"img_4_15_s{i}.mat", make_mat_record(seed=i))
    return str(d)


def test_eval_dataset_optimal(mat_dir):
    ds = EvaluationDataset(mat_dir, rtg_target=10.0, kind="optimal")
    assert len(ds) == 2
    (states, rtg, actions, task), mat = ds[0]
    assert states.shape == (1, 128 * 128)
    lo, hi = OPTIMAL_RTG_RANGE
    np.testing.assert_allclose(rtg[0, 0], (10.0 - lo) / (hi - lo),
                               rtol=1e-5)
    np.testing.assert_array_equal(actions, 0)
    assert int(task[0]) == OPTIMAL_TASKS.index("4x_15")
    assert (mat["x0"] >= 0).all()  # record clipped at 0 (datasets.py:199)
    # ...but the policy's initial state reads the UNCLIPPED x0
    # (datasets.py:202 reads mat['x0'], untouched by the record clip);
    # zero-filled recons typically have negative reals.
    assert states.min() < 0
    raw = loadmat(os.path.join(mat_dir, ds.fns[0]))
    np.testing.assert_array_equal(
        states, np.asarray(raw["x0"])[..., 0].reshape(1, -1))


def test_eval_dataset_flex_task_token(mat_dir):
    ds = EvaluationDataset(mat_dir, rtg_target=3, kind="flex")
    (_, _, _, task), _ = ds[0]
    assert int(task[0]) == FLEX_TASKS.index("rtg_3")
    ds = EvaluationDataset(mat_dir, rtg_target=4.5, kind="flex")
    (_, _, _, task), _ = ds[0]
    assert int(task[0]) == FLEX_TASKS.index("rtg_4.5")


def test_sharded_batches_equal_counts(traj_dir):
    """Uneven shard split (3 trajectories / 2 shards) must still give every
    process the SAME number of batches — DistributedSampler's equal-count
    guarantee (wrap-padding), without which multi-host collective steps
    desync (one process runs a partner-less step)."""
    ds = _make_ds(traj_dir)  # 3 trajectories
    per_shard = [list(ds.batches(batch_size=2, seed=0, shard_index=i,
                                 num_shards=2)) for i in range(2)]
    assert len(per_shard[0]) == len(per_shard[1]) == 1
    # Union of shard items covers the whole permutation (one wrap dup).
    seen = sum(b["states"].shape[0] for shard in per_shard for b in shard)
    assert seen == 4  # 3 items + 1 wrap-padded duplicate


def test_sharded_batches_default_seed_is_deterministic(traj_dir):
    """batches() without an explicit seed must give every process the same
    permutation (an int default, not None — np.default_rng(None) would
    hand each process an independent shuffle and desync the shards).
    Window crops within items remain dataset-rng random; only the
    permutation contract is pinned here."""
    import inspect
    ds = _make_ds(traj_dir)
    default = inspect.signature(ds.batches).parameters["seed"].default
    assert isinstance(default, int)


def test_action_columns_follow_documented_order(tmp_path, rng):
    """Action columns must be (T, sigma_d, mu) regardless of the json
    dict's serialization order."""
    import json as _json
    import h5py as _h5py
    from dt4image_restoration_tpu.data.datasets import TrainingDataset

    h5_path = tmp_path / "s.h5"
    with _h5py.File(h5_path, "w") as f:
        for t in range(6):
            f.create_dataset(f"t0/s{t}", data=np.zeros((128, 128), np.uint8))
    traj = {
        "RTG": [1.0] * 6,
        # Deliberately scrambled key order in the file.
        "Actions": {"mu": [3.0] * 6, "T": [1.0] * 6, "sigma_d": [2.0] * 6},
        "State Paths": ["0123456789" + f"t0/s{t}" for t in range(6)],
        "Task": "4x_10",
    }
    os.makedirs(tmp_path / "trajs")
    with open(tmp_path / "trajs" / "t0.json", "w") as jf:
        _json.dump(traj, jf)
    from dt4image_restoration_tpu.data.datasets import OPTIMAL_TASKS
    ds = TrainingDataset(
        block_size=18, data_dir=str(tmp_path / "trajs"), action_dim=3,
        state_file_path=str(h5_path), tasks=OPTIMAL_TASKS,
        min_rtg=0.0, max_rtg=1.0, normalize_rtg=False,
        rng=np.random.default_rng(0))
    _, actions, *_ = ds[0]
    np.testing.assert_array_equal(actions[0], [1.0, 2.0, 3.0])  # T, sd, mu


def test_background_batches_propagates_iterator_errors():
    """A corrupt file mid-epoch must FAIL the epoch loudly, not silently
    truncate it (multi-host: a short epoch desyncs collectives)."""
    from dt4image_restoration_tpu.training.sharding import (
        background_batches)

    def bad_iterator():
        yield {"ok": np.zeros(1)}
        raise ValueError("corrupt trajectory file")

    it = background_batches(bad_iterator())
    assert next(it)["ok"].shape == (1,)
    with pytest.raises(ValueError, match="corrupt trajectory"):
        next(it)


def test_sharded_batches_pad_exceeds_dataset(traj_dir):
    """Wrap-padding must repeat cyclically: 3 trajectories on 8 shards
    (pad 5 > len) still gives every shard exactly one item."""
    ds = _make_ds(traj_dir)  # 3 trajectories
    counts = [sum(b["states"].shape[0]
                  for b in ds.batches(batch_size=1, seed=0,
                                      shard_index=i, num_shards=8))
              for i in range(8)]
    assert counts == [1] * 8
