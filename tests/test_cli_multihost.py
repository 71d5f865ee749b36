"""Multi-host CLI input sharding: `main()`'s eval and mcts commands driven
end-to-end by a REAL 2-process JAX distributed runtime must (a) give each
process a DISJOINT slice of the global record list (no redundant
evaluation — the round-2 gap: every host used to evaluate all images) and
(b) print the same per-directory aggregates / per-tree rewards as a
single-process run over the same data.
"""
import os
import re
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import savemat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_eval_dir(tmp_path, n=6):
    sys.path.insert(0, REPO)
    from dt4image_restoration_tpu.data import make_mat_record
    d = tmp_path / "4_15"
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        savemat(d / f"img_4_15_s{i}.mat", make_mat_record(seed=i))
    return str(d)


EVAL_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

import main as cli
from dt4image_restoration_tpu.inference.evaluator import Evaluator

# Record the per-process work: each process must evaluate only its slice.
seen = []
orig = Evaluator.evaluate_records
def spy(self, records, **kw):
    seen.append(len(records))
    return orig(self, records, **kw)
Evaluator.evaluate_records = spy

import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", os.environ["EVAL_DIR"]])
out = buf.getvalue()

rank = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
# 6 global records over 2 processes -> 3 local (disjoint, not 6).
assert seen == [3], seen
with open(os.environ["OUT_PATH"] + f".rank{rank}.txt", "w") as f:
    f.write(out)
open(os.environ["OUT_PATH"] + f".ok{rank}", "w").write("ok")
"""

SINGLE_EVAL = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
import main as cli
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    cli.main(["--block_size", "18", "--n_embeds", "9", "eval",
              "--rtg", "10", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--data_dirs", os.environ["EVAL_DIR"]])
with open(os.environ["OUT_PATH"] + ".single.txt", "w") as f:
    f.write(buf.getvalue())
"""


def _spawn(worker, n_proc, extra_env):
    """Coordinated 2-process launch via test_multihost's shared helper
    (file-streamed logs, free coordinator port): 1 CPU device per
    process; these workers write their own .ok sentinels, checked by the
    callers where relevant."""
    from tests.test_multihost import _spawn_ranks
    out_path = extra_env["OUT_PATH"]
    return _spawn_ranks(worker, out_path, n_proc=n_proc, device_count=1,
                        extra_env=extra_env, check_sentinels=False)


def _metrics(text):
    return [float(x) for x in re.findall(
        r"(?:Average iter|Average reward|PSNR increment|MCTS Reward)"
        r"[,: ]+(-?[\d.]+)", text)]


def test_cli_eval_two_process_shards_and_matches(tmp_path):
    eval_dir = _make_eval_dir(tmp_path)
    out_path = str(tmp_path / "cli_eval")
    extra = {"EVAL_DIR": eval_dir, "OUT_PATH": out_path}
    _spawn(EVAL_WORKER, 2, extra)
    for rank in range(2):
        assert os.path.exists(out_path + f".ok{rank}")

    # Single-process reference with the SAME global device count (2 devices
    # in one process -> identical mesh + program layout).
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               REPO_ROOT=REPO, EVAL_DIR=eval_dir, OUT_PATH=out_path)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    p = subprocess.run([sys.executable, "-c", SINGLE_EVAL], env=env,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=600)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]

    single = _metrics(open(out_path + ".single.txt").read())
    assert len(single) == 3  # iter, reward, increment for the one dir
    for rank in range(2):
        got = _metrics(open(out_path + f".rank{rank}.txt").read())
        np.testing.assert_allclose(got, single, rtol=1e-4, atol=1e-4)


MCTS_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

import dt4image_restoration_tpu.config as config_mod
orig_cls = config_mod.MCTSConfig
config_mod.MCTSConfig = lambda **kw: orig_cls(**{"iterations": 2, **kw})

import main as cli
from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS

seen = []
orig = DeviceMCTS.run_batch
def spy(self, records, **kw):
    seen.append(len(records))
    return orig(self, records, **kw)
DeviceMCTS.run_batch = spy

import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    cli.main(["--block_size", "18", "--n_embeds", "9", "mcts",
              "--rtg", "5", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--search_batch", "2",
              "--data_dirs", os.environ["EVAL_DIR"]])
out = buf.getvalue()

rank = jax.process_index()
# 4 global records over 2 processes = 2 local, one chunk of 2.
assert seen == [2], seen
with open(os.environ["OUT_PATH"] + f".rank{rank}.txt", "w") as f:
    f.write(out)
open(os.environ["OUT_PATH"] + f".ok{rank}", "w").write("ok")
"""

SINGLE_MCTS = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
import dt4image_restoration_tpu.config as config_mod
orig_cls = config_mod.MCTSConfig
config_mod.MCTSConfig = lambda **kw: orig_cls(**{"iterations": 2, **kw})
import main as cli
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    cli.main(["--block_size", "18", "--n_embeds", "9", "mcts",
              "--rtg", "5", "--max_timesteps", "6",
              "--checkpoint", "/nonexistent.pt",
              "--denoiser_ckpt", "/nonexistent.pt",
              "--search_batch", "2",
              "--data_dirs", os.environ["EVAL_DIR"]])
with open(os.environ["OUT_PATH"] + ".single.txt", "w") as f:
    f.write(buf.getvalue())
"""


def test_cli_mcts_two_process_shards_and_matches(tmp_path):
    eval_dir = _make_eval_dir(tmp_path, n=4)
    out_path = str(tmp_path / "cli_mcts")
    extra = {"EVAL_DIR": eval_dir, "OUT_PATH": out_path}
    _spawn(MCTS_WORKER, 2, extra)
    for rank in range(2):
        assert os.path.exists(out_path + f".ok{rank}")

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               REPO_ROOT=REPO, EVAL_DIR=eval_dir, OUT_PATH=out_path)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    p = subprocess.run([sys.executable, "-c", SINGLE_MCTS], env=env,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=600)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]

    single_txt = open(out_path + ".single.txt").read()
    single = _metrics(single_txt)
    assert len(single) == 4  # one reward line per record, in order
    assert "Total MCTS reward:" in single_txt
    for rank in range(2):
        txt = open(out_path + f".rank{rank}.txt").read()
        np.testing.assert_allclose(_metrics(txt), single,
                                   rtol=1e-4, atol=1e-4)
        assert "Total MCTS reward:" in txt
