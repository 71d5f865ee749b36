"""End-to-end CLI smoke tests (reference command surface, main.py:133-155)
on synthetic fixtures with random weights."""
import json
import os

import h5py
import numpy as np
import pytest
from scipy.io import savemat

import main as cli
from dt4image_restoration_tpu.data import make_mat_record


@pytest.fixture
def eval_dir(tmp_path):
    d = tmp_path / "4_15"
    os.makedirs(d)
    for i in range(2):
        savemat(d / f"img_4_15_s{i}.mat", make_mat_record(seed=i))
    return str(d)


@pytest.fixture
def train_fixture(tmp_path, rng):
    h5_path = tmp_path / "states.h5"
    data_dir = tmp_path / "trajs"
    os.makedirs(data_dir)
    with h5py.File(h5_path, "w") as f:
        for traj_idx in range(4):
            paths = []
            for t in range(6):
                key = f"t{traj_idx}/s{t}"
                f.create_dataset(key, data=rng.integers(
                    0, 256, (128, 128)).astype(np.uint8))
                paths.append("0123456789" + key)
            traj = {
                "RTG": list(np.linspace(5, 0, 6)),
                "Actions": {k: list(rng.uniform(0, 1, 6))
                            for k in ("T", "sigma_d", "mu")},
                "State Paths": paths,
                "Task": "4x_10",
            }
            with open(data_dir / f"traj_{traj_idx}.json", "w") as jf:
                json.dump(traj, jf)
    return str(data_dir), str(h5_path)


def test_cli_eval_smoke(eval_dir, capsys):
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "8",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", eval_dir])
    out = capsys.readouterr().out
    assert "Average reward" in out and "PSNR increment" in out


def test_cli_eval_unet_packed_matches_direct(eval_dir, capsys):
    """--unet_packed {s2d, pallas, winograd, winograd_deep} (s2d packed /
    fused whole-block kernels on the 128^2 stages / Winograd F(2x2,3x3)
    on every block) are exact rewrites of the direct convs: the printed
    episode averages must match the default run to reassociation-level
    tolerance (PARITY.md D14)."""
    def run(packed):
        cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
                  "--rtg", "10", "--max_timesteps", "6",
                  "--checkpoint", "/nonexistent.pt",
                  "--denoiser_ckpt", "/nonexistent.pt",
                  "--unet_packed", packed,
                  "--data_dirs", eval_dir])
        out = capsys.readouterr().out
        return [float(line.split()[-1]) for line in out.splitlines()
                if "Average reward" in line or "PSNR increment" in line]

    base = run("none")
    assert len(base) == 2
    for packed in ("s2d", "pallas", "winograd", "winograd_deep"):
        np.testing.assert_allclose(run(packed), base,
                                   rtol=1e-4, atol=1e-4)


def test_cli_eval_bf16_smoke(eval_dir, capsys):
    """--dtype bfloat16 on eval (the reference's autocast policy applied to
    inference, main.py:37-40); rollouts stay within tolerance of f32 per
    the bench (0.0066 dB)."""
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "8",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--dtype", "bfloat16",
              "--data_dirs", eval_dir])
    out = capsys.readouterr().out
    assert "Average reward" in out


def test_cli_mcts_smoke(eval_dir, capsys, monkeypatch):
    # Shrink the search so the smoke test stays fast (cmd_mcts imports
    # MCTSConfig from the config module at call time).
    import dt4image_restoration_tpu.config as config_mod
    orig_cls = config_mod.MCTSConfig
    monkeypatch.setattr(
        config_mod, "MCTSConfig",
        lambda **kw: orig_cls(**{"iterations": 2, **kw}))
    cli.main(["--block_size", "18", "--n_embeds", "9", "mcts",
              "--rtg", "5", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", eval_dir])
    out = capsys.readouterr().out
    assert "MCTS Reward" in out


def test_cli_flex_smoke(eval_dir, capsys, monkeypatch):
    # One RTG target keeps the smoke test fast; the evaluators share one
    # compiled program either way.
    monkeypatch.setattr(cli, "FLEX_RTGS", [3])
    cli.main(["--block_size", "18", "--n_embeds", "6", "flex",
              "--max_timesteps", "8",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", eval_dir])
    out = capsys.readouterr().out
    assert "Average increment" in out


def _run_train(train_fixture, tmp_path, capsys, monkeypatch,
               extra_args=()) -> str:
    data_dir, h5_path = train_fixture
    monkeypatch.chdir(tmp_path)
    cli.main(["--block_size", "18", "train", "--batch_size", "2",
              "--save_every", "1", "--max_epochs", "1",
              "--data_dir", data_dir, "--state_file", h5_path,
              "--checkpoint_dir", str(tmp_path / "ckpts"), *extra_args])
    out = capsys.readouterr().out
    assert "Training complete" in out
    assert os.path.isdir(tmp_path / "ckpts" / "model_0")
    return str(tmp_path / "ckpts" / "model_0")


def test_cli_train_smoke(train_fixture, tmp_path, capsys, monkeypatch):
    _run_train(train_fixture, tmp_path, capsys, monkeypatch)


def test_cli_train_async_save_smoke(train_fixture, tmp_path, capsys,
                                    monkeypatch):
    """--async_save: checkpoints land through the background writer and
    the run completes with the same artifacts as the sync path."""
    _run_train(train_fixture, tmp_path, capsys, monkeypatch,
               extra_args=("--async_save",))


def test_cli_train_preload_smoke(train_fixture, tmp_path, capsys,
                                 monkeypatch):
    """--preload_data trains through the native-assembly fast path
    (data/native_loader.py); the loss path and checkpoints are identical
    because batch assembly is bit-exact with the streaming path."""
    _run_train(train_fixture, tmp_path, capsys, monkeypatch,
               extra_args=["--preload_data"])


def test_cli_train_then_eval_orbax_roundtrip(train_fixture, eval_dir,
                                             tmp_path, capsys, monkeypatch):
    """Close the loop: a trained orbax checkpoint loads straight into eval
    (the reference's torch .pt round-trip equivalent)."""
    ckpt = _run_train(train_fixture, tmp_path, capsys, monkeypatch)
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "8",
              "--checkpoint", ckpt,
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", eval_dir])
    out = capsys.readouterr().out
    assert "Average reward" in out


def test_cli_mcts_multi_dir_chunked(tmp_path, capsys, monkeypatch):
    """Cross-directory tree batching: two directories' records flow into
    --search_batch chunks (here 3 -> a full chunk spanning both dirs plus
    a partial chunk), one device program per chunk."""
    import dt4image_restoration_tpu.config as config_mod
    orig_cls = config_mod.MCTSConfig
    monkeypatch.setattr(
        config_mod, "MCTSConfig",
        lambda **kw: orig_cls(**{"iterations": 2, **kw}))
    dirs = []
    for name in ("4_15", "8_10"):
        d = tmp_path / name
        os.makedirs(d)
        for i in range(2):
            savemat(d / f"img_{name}_s{i}.mat",
                    make_mat_record(seed=i + (0 if name == "4_15" else 7)))
        dirs.append(str(d))
    cli.main(["--block_size", "18", "--n_embeds", "9", "mcts",
              "--rtg", "5", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--search_batch", "3",
              "--data_dirs", *dirs])
    out = capsys.readouterr().out
    assert out.count("MCTS Reward") == 4  # all records across both dirs
    assert "Total MCTS reward:" in out


def test_cli_flex_partial_layout_average(eval_dir, tmp_path, capsys,
                                         monkeypatch):
    """A missing eval directory is skipped with a warning and the printed
    average divides by the number of directories actually evaluated —
    not the requested count (round-2 verdict: the old total/len(dirs)
    silently deflated the average in exactly the partial layout D9 made
    survivable)."""
    monkeypatch.setattr(cli, "FLEX_RTGS", [3])
    missing = str(tmp_path / "no_such_dir")
    empty = str(tmp_path / "exists_but_no_mats")
    os.makedirs(empty)
    cli.main(["--block_size", "18", "--n_embeds", "6", "flex",
              "--max_timesteps", "8",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", eval_dir, missing, empty])
    cap = capsys.readouterr()
    # Both non-contributing layouts are excluded from the divisor: a
    # missing dir AND an existing-but-recordless dir (which would add
    # nothing to the total but silently widen the denominator).
    assert cap.err.count("skipping missing/empty eval directory") == 2
    # One evaluated dir -> the average IS that dir's increment.
    incr = float(cap.out.split("PSNR increment ")[1].split("\n")[0])
    avg = float(cap.out.split("Average increment: ")[1].split("\n")[0])
    np.testing.assert_allclose(avg, incr, rtol=1e-6)


def test_cli_eval_all_dirs_missing_raises(tmp_path):
    """When NO eval directory exists the CLI fails loudly (reference
    main.py:205 crashes too) instead of evaluating nothing."""
    with pytest.raises(FileNotFoundError, match="none of the evaluation"):
        cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
                  "--rtg", "10", "--max_timesteps", "8",
                  "--checkpoint", "/nonexistent.pt",
                  "--denoiser_ckpt", "/nonexistent.pt",
                  "--data_dirs", str(tmp_path / "missing")])


def test_cli_platform_guard(monkeypatch, tmp_path):
    """--platform default fails FAST with guidance when the backend probe
    dies (tunnel outage: jax.devices() would hang), and --platform cpu
    is an explicit escape hatch — the production CLI never silently
    falls back (main.py _ensure_backend)."""
    from dt4image_restoration_tpu.utils import tpu_probe

    # Simulate an outage: nothing forces CPU and the probe is DEAD (a
    # healthy non-TPU backend would answer and proceed normally).
    monkeypatch.setattr(tpu_probe, "_env_forces_cpu", lambda: False)
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: None)
    with pytest.raises(SystemExit, match="--platform cpu"):
        cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
                  "--rtg", "10", "--checkpoint", "/nonexistent.pt",
                  "--denoiser_ckpt", "/nonexistent.pt",
                  "--data_dirs", str(tmp_path / "missing")])

    # --platform cpu skips the probe entirely (would raise above) and
    # proceeds to normal dispatch (missing dirs -> the loud failure).
    with pytest.raises(FileNotFoundError, match="none of the evaluation"):
        cli.main(["--block_size", "18", "--n_embeds", "9",
                  "--platform", "cpu", "eval",
                  "--rtg", "10", "--checkpoint", "/nonexistent.pt",
                  "--denoiser_ckpt", "/nonexistent.pt",
                  "--data_dirs", str(tmp_path / "missing")])


def test_ensure_backend_env_cpu_flips_config(monkeypatch):
    """JAX_PLATFORMS=cpu in the env alone does NOT switch backends
    (sitecustomize pre-imports jax pinned to the tunnel — CLAUDE.md), so
    _ensure_backend must call jax.config.update on the env-forces-CPU
    path instead of returning early — otherwise the run silently stays
    on the TPU and hangs during an outage."""
    import jax

    from dt4image_restoration_tpu.utils import tpu_probe

    monkeypatch.setattr(tpu_probe, "_env_forces_cpu", lambda: True)
    monkeypatch.setattr(
        tpu_probe, "probe_backend",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("probe must not run when env forces CPU")))
    calls = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: calls.append((k, v)))
    cli._ensure_backend("default")
    assert ("jax_platforms", "cpu") in calls


def test_cli_data_root_reroots_default_dirs(tmp_path, capsys):
    """--data_root points the DEFAULT nine-dir list at another root (the
    layout tools/make_dataset.py --eval writes): present dirs evaluate,
    missing ones warn-skip, and an empty root fails loudly with the
    re-rooted paths."""
    from dt4image_restoration_tpu.data.expert import make_eval_dirs
    make_eval_dirs(str(tmp_path), per_dir=1, dirs=["4_15"])
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_root", str(tmp_path)])
    captured = capsys.readouterr()
    assert "Average reward" in captured.out
    # The other eight default dirs were looked up under the root and
    # warn-skipped.
    assert captured.err.count("skipping missing/empty") == 8
    assert str(tmp_path) in captured.err

    with pytest.raises(FileNotFoundError, match="none of the evaluation"):
        cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
                  "--rtg", "10", "--checkpoint", "/nonexistent.pt",
                  "--denoiser_ckpt", "/nonexistent.pt",
                  "--data_root", str(tmp_path / "empty")])
