"""Sharded batched evaluation + prefetch + distributed-init tests on the
virtual 8-device CPU mesh."""
import numpy as np
import jax
import pytest

from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.inference import Evaluator
from dt4image_restoration_tpu.models import DecisionTransformer
from dt4image_restoration_tpu.models.decision_transformer import init_dt_params
from dt4image_restoration_tpu.training import make_mesh
from dt4image_restoration_tpu.training.sharding import (
    maybe_initialize_distributed, prefetch_to_device, shard_batch)

CFG = ModelConfig(block_size=18, n_embeds=9, mode="norm")


def dt_apply(params, rtg, states, timesteps, task, actions):
    return DecisionTransformer(CFG).apply(
        {"params": params}, rtg, states, timesteps, task, actions)


def stub_denoise(img, sigma):
    import jax.numpy as jnp
    return jnp.clip(0.8 * img + 0.1, 0.0, 1.0)


def _records(n):
    out = []
    for i in range(n):
        mat = dict(make_mat_record(seed=i))
        # Dataset semantics: policy state from the UNCLIPPED x0, record
        # clipped (datasets.py parity).
        states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
        mat["x0"] = np.clip(mat["x0"], 0, None)
        out.append(((states, np.full((1, 1), 0.6, np.float32),
                     np.zeros(3, np.float32), np.asarray([2], np.int32)),
                    mat))
    return out


@pytest.fixture(scope="module")
def params():
    return init_dt_params(CFG, seed=0)


def test_sharded_eval_matches_unsharded(params):
    """7 images (padded to 8 shards) must give identical metrics to the
    single-device run."""
    records = _records(7)
    kwargs = dict(dt_apply=dt_apply, dt_params=params,
                  denoise=stub_denoise, cfg=CFG, max_timesteps=8)
    plain = Evaluator(**kwargs).evaluate_records(records)
    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        sharded = Evaluator(mesh=mesh, **kwargs).evaluate_records(records)

    assert sharded["reward"].shape == (7,)
    np.testing.assert_allclose(sharded["reward"], plain["reward"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(sharded["episode_len"],
                                  plain["episode_len"])


def test_sharded_mcts_runs_and_is_deterministic(params):
    """Lockstep trees sharded over the 8-device mesh: 3 images pad to 8
    shards, padding dropped from outputs; two identical sharded runs agree
    bitwise (per-tree RNG streams are host-side and mesh-independent)."""
    from dt4image_restoration_tpu.config import MCTSConfig
    from dt4image_restoration_tpu.inference.mcts import BatchedMCTS
    from dt4image_restoration_tpu.models.arniqa import proxy_value_fn

    mesh = make_mesh(n_data=8, n_model=1)
    mcts = BatchedMCTS(
        dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
        model_cfg=CFG, cfg=MCTSConfig(iterations=3, max_timesteps=8),
        value_fn=proxy_value_fn, mesh=mesh)
    records = _records(3)
    with mesh:
        r1 = mcts.run_batch(records, seeds=[5, 6, 7])
        r2 = mcts.run_batch(records, seeds=[5, 6, 7])
    assert len(r1) == 3
    assert all(np.isfinite(v) and 0 < v < 60 for v in r1)
    assert r1 == r2


def test_sharded_device_mcts_runs_and_is_deterministic(params):
    """The device-resident search (one XLA program for the whole search)
    sharded over the 8-device mesh: same contract as the host backend —
    padding dropped, deterministic given seeds."""
    from dt4image_restoration_tpu.config import MCTSConfig
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
    from dt4image_restoration_tpu.models.arniqa import (
        proxy_value_fn, proxy_value_fn_jax)

    mesh = make_mesh(n_data=8, n_model=1)
    mcts = DeviceMCTS(
        dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
        model_cfg=CFG, cfg=MCTSConfig(iterations=3, max_timesteps=8),
        value_fn=proxy_value_fn, value_fn_jax=proxy_value_fn_jax,
        mesh=mesh)
    records = _records(3)
    with mesh:
        r1 = mcts.run_batch(records, seeds=[5, 6, 7])
        r2 = mcts.run_batch(records, seeds=[5, 6, 7])
    assert len(r1) == 3
    assert all(np.isfinite(v) and 0 < v < 60 for v in r1)
    assert r1 == r2


def test_prefetch_to_device(rng):
    mesh = make_mesh(n_data=8, n_model=1)
    batches = [{
        "states": rng.uniform(0, 1, (8, 6, 4)).astype(np.float32),
        "actions": rng.uniform(0, 1, (8, 6, 3)).astype(np.float32),
        "rtg": rng.uniform(0, 1, (8, 6, 1)).astype(np.float32),
        "traj_masks": np.ones((8, 6, 1), np.float32),
        "timesteps": np.zeros((8, 6, 1), np.int32),
        "task": np.zeros((8, 6), np.int32),
    } for _ in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    for got, want in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(got["states"]),
                                      want["states"])
        assert len(got["states"].sharding.device_set) == 8


def test_maybe_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    maybe_initialize_distributed()  # must be a no-op without env


def test_background_batches_preserves_order_and_items():
    from dt4image_restoration_tpu.training.sharding import background_batches
    items = list(range(20))
    out = list(background_batches(iter(items), size=3))
    assert out == items
