"""Native (C++) batch-state assembly: kernel exactness vs the numpy
oracle, and TrainingDataset(preload=True) bit-exactness vs the streaming
json/h5py path (data/native_loader.py, datasets.py preload fast path)."""
import json
import os

import h5py
import numpy as np
import pytest

from dt4image_restoration_tpu.config import OPTIMAL_RTG_RANGE, OPTIMAL_TASKS
from dt4image_restoration_tpu.data import TrainingDataset
from dt4image_restoration_tpu.data.native_loader import (
    _LUT_NP, _gather_numpy, gather_scale_u8, native_available)


@pytest.fixture
def traj_dir(tmp_path, rng):
    """Trajectory corpus spanning all three window branches: pad (4 < 6),
    exact (6 == 6), crop (9 > 6) — plus a repeated h5 key across items."""
    h5_path = tmp_path / "states.h5"
    data_dir = tmp_path / "trajs"
    os.makedirs(data_dir)
    with h5py.File(h5_path, "w") as f:
        for traj_idx, length in enumerate([4, 6, 9]):
            paths = []
            for t in range(length):
                key = f"traj{traj_idx}/state{t % max(length - 1, 1)}"
                if key not in f:
                    f.create_dataset(key, data=rng.integers(
                        0, 256, (128, 128)).astype(np.uint8))
                paths.append("0123456789" + key)
            traj = {
                "RTG": list(np.linspace(5, 0, length)),
                "Actions": {k: list(rng.uniform(0, 1, length))
                            for k in ("T", "sigma_d", "mu")},
                "State Paths": paths,
                "Task": "4x_10",
            }
            with open(data_dir / f"traj_{traj_idx}.json", "w") as jf:
                json.dump(traj, jf)
    return str(data_dir), str(h5_path)


def _make_ds(traj_dir, preload, **kw):
    data_dir, h5_path = traj_dir
    lo, hi = OPTIMAL_RTG_RANGE
    return TrainingDataset(
        block_size=6, data_dir=data_dir, action_dim=3,
        state_file_path=h5_path, tasks=OPTIMAL_TASKS,
        min_rtg=lo, max_rtg=hi, rng=np.random.default_rng(0),
        preload=preload, **kw)


def test_native_kernel_builds_on_this_image():
    # g++ is baked into the image; a silent fallback would hide a real
    # build regression, so the kernel's availability is itself asserted.
    assert native_available()


def test_lut_bitexact_with_float64_path():
    v = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(_LUT_NP[v], np.float32(v / 255))


@pytest.mark.parametrize("n_threads", [1, 3])
def test_gather_matches_numpy_oracle(rng, n_threads):
    if not native_available():
        pytest.skip("no C++ toolchain")
    src = rng.integers(0, 256, (11, 37)).astype(np.uint8)
    rows = np.array([[0, 10, -1], [3, 3, 5]], np.int64)
    out = gather_scale_u8(src, rows, n_threads=n_threads)
    assert out.shape == (2, 3, 37) and out.dtype == np.float32
    np.testing.assert_array_equal(
        out, _gather_numpy(src, rows.reshape(-1)).reshape(2, 3, 37))


def test_gather_rejects_out_of_range(rng):
    src = rng.integers(0, 256, (4, 8)).astype(np.uint8)
    with pytest.raises(IndexError):
        gather_scale_u8(src, np.array([4], np.int64))
    with pytest.raises(ValueError):
        gather_scale_u8(src.astype(np.float32), np.array([0], np.int64))


def test_preload_items_bitexact_with_streaming(traj_dir):
    stream, pre = _make_ds(traj_dir, False), _make_ds(traj_dir, True)
    for idx in range(3):  # pad, exact-length, random-crop branches
        for a, b in zip(stream[idx], pre[idx]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preload_batches_bitexact_with_streaming(traj_dir):
    stream, pre = _make_ds(traj_dir, False), _make_ds(traj_dir, True)
    got = list(pre.batches(batch_size=2, seed=0))
    want = list(stream.batches(batch_size=2, seed=0))
    assert len(got) == len(want) == 1
    for k in want[0]:
        np.testing.assert_array_equal(got[0][k], want[0][k])
        assert got[0][k].dtype == want[0][k].dtype


def test_preload_sharded_batches_bitexact(traj_dir):
    """Per-process input sharding (wrap-pad + stride) composes with the
    preloaded fast path identically to the streaming path."""
    for shard in (0, 1):
        stream, pre = _make_ds(traj_dir, False), _make_ds(traj_dir, True)
        want = list(stream.batches(batch_size=2, seed=3, shard_index=shard,
                                   num_shards=2))
        got = list(pre.batches(batch_size=2, seed=3, shard_index=shard,
                               num_shards=2))
        assert len(got) == len(want) == 1
        for k in want[0]:
            np.testing.assert_array_equal(got[0][k], want[0][k])


def test_preload_item_mutation_does_not_corrupt_cache(traj_dir):
    # Index 1 is the exact-length trajectory (no rng draw), so repeated
    # reads from the SAME instance must be identical even after a caller
    # mutates a previously returned item in place.
    pre = _make_ds(traj_dir, True)
    before = [np.array(a) for a in pre[1]]
    for a in pre[1]:
        np.asarray(a)[...] = -1.0
    for a, b in zip(pre[1], before):
        np.testing.assert_array_equal(np.asarray(a), b)


@pytest.mark.parametrize("extras", [(2, 2, 2), (3, 1, 0)],
                         ids=["uniform-extra", "ragged-extra"])
def test_preload_handles_extra_action_and_path_entries(tmp_path, rng,
                                                       extras):
    """Actions / State Paths may legally be LONGER than RTG (e.g. a
    recorder that stores the terminal state) — and even RAGGED across
    action keys: traj_len is len(RTG), and preload must truncate each key
    to it exactly like the streaming path (full-length np.stack raised
    ValueError on the ragged case)."""
    h5_path = tmp_path / "states.h5"
    data_dir = tmp_path / "trajs"
    os.makedirs(data_dir)
    length = 4  # RTG entries; actions/paths run longer by `extras`
    with h5py.File(h5_path, "w") as f:
        paths = []
        for t in range(length + max(extras)):
            key = f"traj0/state{t}"
            f.create_dataset(key, data=rng.integers(
                0, 256, (16, 16)).astype(np.uint8))
            paths.append("0123456789" + key)
        traj = {
            "RTG": list(np.linspace(5, 0, length)),
            "Actions": {k: list(rng.uniform(0, 1, length + e))
                        for k, e in zip(("T", "sigma_d", "mu"), extras)},
            "State Paths": paths,
            "Task": "4x_10",
        }
        with open(data_dir / "traj_0.json", "w") as jf:
            json.dump(traj, jf)
    stream = _make_ds((str(data_dir), str(h5_path)), False)
    pre = _make_ds((str(data_dir), str(h5_path)), True)
    for a, b in zip(stream[0], pre[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_cache_dir_is_private(tmp_path):
    from dt4image_restoration_tpu.data import native_loader as nl
    if not nl.native_available():
        pytest.skip("no C++ toolchain")
    d = nl._secure_cache_dir()
    st = os.stat(d)
    assert not (st.st_mode & 0o022)  # not group/other writable
    if hasattr(os, "getuid"):
        assert st.st_uid == os.getuid()


def test_preload_rejects_non_uint8(tmp_path, traj_dir):
    data_dir, h5_path = traj_dir
    with h5py.File(h5_path, "r+") as f:
        key = "traj0/state0"
        del f[key]
        f.create_dataset(key, data=np.zeros((128, 128), np.float32))
    with pytest.raises(ValueError, match="uint8"):
        _make_ds((data_dir, h5_path), True)
