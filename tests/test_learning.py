"""End-to-end learning regression: record expert trajectories with the
real env, write them in the reference's on-disk format, train the DT, and
verify the trained policy recovers the expert's behavior on held-out
slices (the CPU-scale twin of benchmarks/policy_learning_demo.py, which
measured trained +5.05 dB vs expert +5.04 on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.config import (
    ModelConfig, TrainerConfig, OPTIMAL_RTG_RANGE, OPTIMAL_TASKS)
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.data.datasets import TrainingDataset
from dt4image_restoration_tpu.inference import Evaluator
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, make_dt_apply)
from dt4image_restoration_tpu.training import (
    TrainState, make_optimizer, make_train_step)

EP_LEN = 6
N_TRAJ = 12
STEPS = 120
CFG = ModelConfig(block_size=18, n_embeds=9, mode="norm")


def stub_denoise(img, sigma):
    # A denoiser with real effect: pull toward a smoothed image, scaled by
    # sigma — so the expert's sigma_d schedule matters.
    blur = (img + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)
            + jnp.roll(img, 1, 2) + jnp.roll(img, -1, 2)) / 5.0
    w = jnp.clip(4.0 * sigma[:, None, None, None], 0.0, 1.0)
    return jnp.clip((1 - w) * img + w * blur, 0.0, 1.0)


def expert_action(t, ep_len=None):
    # Steeper sigma decay than data.expert's default schedule — tuned for
    # the stub denoiser above.
    if t == EP_LEN - 1:
        return {"T": 0.9, "sigma_d": 8 / 255.0, "mu": 0.5}
    return {"T": 0.02 * t, "sigma_d": (25.0 - 3.0 * t) / 255.0, "mu": 0.5}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Shared recorder (data/expert.py) with the stub denoiser + local
    expert schedule, single task, default physics."""
    from dt4image_restoration_tpu.data.expert import record_expert_corpus
    tmp = tmp_path_factory.mktemp("learn")
    stats = record_expert_corpus(
        str(tmp), stub_denoise, n_traj=N_TRAJ, ep_len=EP_LEN, seed=0,
        tasks=["4x_15"], physics_from_task=False, expert_fn=expert_action)
    return (stats["traj_dir"], stats["h5_path"],
            float(stats["expert_increment_db"]))


def test_pipeline_learns_expert_policy(corpus):
    traj_dir, h5_path, expert_gain = corpus
    assert expert_gain > 0.5  # the expert actually restores

    lo, hi = OPTIMAL_RTG_RANGE
    ds = TrainingDataset(
        block_size=18, data_dir=traj_dir, action_dim=3,
        state_file_path=h5_path, tasks=OPTIMAL_TASKS,
        min_rtg=lo, max_rtg=hi, normalize_rtg=True,
        rng=np.random.default_rng(0))
    params0 = init_dt_params(CFG, seed=0)
    tcfg = TrainerConfig(warmup_steps=15, learning_rate=3e-4,
                         batch_size=6)
    optimizer = make_optimizer(tcfg, max_steps=STEPS, params=params0)
    step_fn = make_train_step(make_dt_apply(CFG, train=True), optimizer)
    state = TrainState(params=jax.tree.map(jnp.copy, params0),
                       opt_state=optimizer.init(params0),
                       step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(0)
    losses, steps, epoch = [], 0, 0
    while steps < STEPS:
        for batch in ds.batches(6, seed=epoch):
            key, sub = jax.random.split(key)
            state, loss = step_fn(
                state, {k: jnp.asarray(v) for k, v in batch.items()}, sub)
            losses.append(float(loss))
            steps += 1
            if steps >= STEPS:
                break
        epoch += 1
    assert np.mean(losses[-10:]) < 0.1 * np.mean(losses[:10])

    target = (expert_gain - lo) / (hi - lo)

    def records(n, seed0):
        out = []
        for i in range(n):
            mat = dict(make_mat_record(seed=seed0 + i))
            states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
            mat["x0"] = np.clip(mat["x0"], 0, None)
            out.append(((states, np.full((1, 1), target, np.float32),
                         np.zeros(3, np.float32),
                         np.asarray([OPTIMAL_TASKS.index("4x_15")],
                                    np.int32)), mat))
        return out

    recs = records(4, seed0=10_000)  # held-out slices
    inc = {}
    for tag, p in (("trained", jax.device_get(state.params)),
                   ("random", params0)):
        ev = Evaluator(dt_apply=make_dt_apply(CFG), dt_params=p,
                       denoise=stub_denoise, cfg=CFG, max_timesteps=12)
        m = ev.evaluate_records(recs)
        inc[tag] = float(np.mean(m["increment"]))

    # The trained policy must recover most of the expert's gain and
    # clearly beat the untrained one on held-out data.
    assert inc["trained"] > 0.5 * expert_gain, (inc, expert_gain)
    assert inc["trained"] > inc["random"] + 0.3, inc
