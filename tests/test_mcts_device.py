"""Device-resident MCTS (inference/mcts_device.py) parity with the host-
tree backend: same RNG streams + same (quantized) value function must give
the same expanded-node sequence, the same child priors, the same rollout
rewards, and the same final score — the whole search runs as ONE XLA
program on the device side, so this pins the on-device selection /
backprop / bookkeeping against the host implementation (which is itself
pinned against torch restatements of the reference in test_mcts*.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
from dt4image_restoration_tpu.data import make_mat_record
from dt4image_restoration_tpu.inference.mcts import MCTS
from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
from dt4image_restoration_tpu.models import DecisionTransformer
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params)

CFG = ModelConfig(block_size=18, n_embeds=9, mode="norm")
SEARCH = MCTSConfig(iterations=4, max_timesteps=8)


def dt_apply(params, rtg, states, timesteps, task, actions):
    return DecisionTransformer(CFG).apply(
        {"params": params}, rtg, states, timesteps, task, actions)


def stub_denoise(img, sigma):
    return jnp.clip(0.85 * img + 0.05 + 0.1 * sigma[:, None, None, None],
                    0.0, 1.0)


def quantized_value_jax(x):
    """(B, H, W) -> (B,). Coarse quantization makes the PUCB branching
    immune to cross-compilation reduction-order epsilon, so host and
    device searches see bit-identical rewards."""
    return jnp.round(jnp.mean(x, axis=(1, 2)) * 1e3) / 10.0


_jit_q = jax.jit(quantized_value_jax)


def quantized_value_host(x):
    return float(_jit_q(jnp.asarray(x, jnp.float32).reshape(
        1, x.shape[-2], x.shape[-1]))[0])


def _record(seed=0):
    mat = make_mat_record(seed=seed)
    mat = dict(mat)
    mat["x0"] = np.clip(mat["x0"], 0, None)
    states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
    rtg = np.full((1, 1), 0.6, np.float32)
    return (states, rtg, np.zeros(3, np.float32),
            np.asarray([2], np.int32)), mat


@pytest.fixture(scope="module")
def params():
    return init_dt_params(CFG, seed=0)


@pytest.fixture(scope="module")
def host(params):
    return MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG, cfg=SEARCH, value_fn=quantized_value_host,
                record_trace=True)


@pytest.fixture(scope="module")
def device(params):
    return DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                      denoise=stub_denoise, model_cfg=CFG, cfg=SEARCH,
                      value_fn=quantized_value_host,
                      value_fn_jax=quantized_value_jax,
                      record_trace=True)


def test_device_search_matches_host_backend(host, device):
    records = [_record(seed=2), _record(seed=5)]
    seeds = [11, 13]
    want = host.run_batch(records, seeds=seeds)
    host_traces = host.traces
    got = device.run_batch(records, seeds=seeds)
    dev_traces = device.traces

    for j in range(len(records)):
        for it, (h, d) in enumerate(zip(host_traces[j], dev_traces[j])):
            assert (h["time"], h["edge"], h["index"]) == \
                (d["time"], d["edge"], d["index"]), (j, it)
            np.testing.assert_allclose(h["probs"], d["probs"], rtol=1e-5)
            np.testing.assert_allclose(h["reward"], d["reward"],
                                       rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_device_search_deterministic(device):
    r = _record(seed=3)
    a = device.run_batch([r], seeds=[7])
    b = device.run_batch([r], seeds=[7])
    assert a == b


def test_device_search_single_equals_batched(device):
    """A tree's result must not depend on its batch companions beyond
    reduction-order epsilon (lockstep invariance, same contract as the
    host backend's test_batched_mcts_equivalence)."""
    r = _record(seed=4)
    solo = device.run_batch([r], seeds=[9])
    twins = device.run_batch([r, r], seeds=[9, 9])
    assert twins[0] == twins[1]
    np.testing.assert_allclose(solo[0], twins[0], rtol=1e-4)


def test_device_search_deep_trees_match_host(params):
    """More iterations than max_timesteps: descent can push leaves to the
    t == maxT boundary where buffer writes clamp (the a93a9d0 OOB fix) —
    the device backend must track the host trace there too."""
    deep = MCTSConfig(iterations=6, max_timesteps=6)
    host = MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG, cfg=deep, value_fn=quantized_value_host,
                record_trace=True)
    device = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                        denoise=stub_denoise, model_cfg=CFG, cfg=deep,
                        value_fn=quantized_value_host,
                        value_fn_jax=quantized_value_jax,
                        record_trace=True)
    r = _record(seed=6)
    want = host.run_batch([r], seeds=[21])
    got = device.run_batch([r], seeds=[21])
    for h, d in zip(host.traces[0], device.traces[0]):
        assert (h["time"], h["edge"], h["index"]) == \
            (d["time"], d["edge"], d["index"])
        np.testing.assert_allclose(h["reward"], d["reward"], rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def hash_value_jax(x):
    """Pseudo-random (but deterministic and epsilon-safe) image score:
    quantize first, then scramble — successive rollout rewards jump up AND
    down, so max-backprop must propagate through ancestors for selection
    to stay on the host's trajectory."""
    q = jnp.round(jnp.mean(x, axis=(1, 2)) * 1e3)
    return jnp.mod(q * 37.0, 97.0)


_jit_hash = jax.jit(hash_value_jax)


def hash_value_host(x):
    return float(_jit_hash(jnp.asarray(x, jnp.float32).reshape(
        1, x.shape[-2], x.shape[-1]))[0])


def test_max_backprop_reaches_ancestors():
    """Direct regression for the stale-parent-closure bug: a reward
    improving over an interior ancestor must propagate up the parent
    chain and stop at the first non-improving ancestor (host
    Node.backprop semantics). Trace-level e2e tests alone cannot catch
    this — the parent term cancels among siblings at the root, so a
    root-only update never flips an argmax."""
    from dt4image_restoration_tpu.inference.mcts_device import max_backprop
    # Two trees, chain 0 <- 1 <- 2.
    parent = jnp.asarray([[-1, 0, 1, -1], [-1, 0, 1, -1]], jnp.int32)
    reward = jnp.asarray([[5.0, 3.0, 0.0, 0.0],
                          [1.0, 3.0, 0.0, 0.0]], jnp.float32)
    leaf = jnp.asarray([2, 2], jnp.int32)
    r = jnp.asarray([4.0, 4.0], jnp.float32)
    out = np.asarray(max_backprop(reward, parent, leaf, r))
    # Tree 0: leaf and node 1 improve to 4; root 5 stays (early stop).
    np.testing.assert_allclose(out[0], [5.0, 4.0, 4.0, 0.0])
    # Tree 1: improves all the way to the root.
    np.testing.assert_allclose(out[1], [4.0, 4.0, 4.0, 0.0])


def test_device_backprop_reaches_ancestors_like_host(params):
    """Broad trace parity under non-monotonic reward sequences (rollout
    rewards jump up AND down across iterations)."""
    cfg = MCTSConfig(iterations=8, max_timesteps=8)
    host = MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG, cfg=cfg, value_fn=hash_value_host,
                record_trace=True)
    device = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                        denoise=stub_denoise, model_cfg=CFG, cfg=cfg,
                        value_fn=hash_value_host,
                        value_fn_jax=hash_value_jax, record_trace=True)
    r = _record(seed=8)
    want = host.run_batch([r], seeds=[31])
    got = device.run_batch([r], seeds=[31])
    # The scenario must actually exercise ancestor propagation: at least
    # one rollout reward must exceed an earlier one (improving sequence).
    rewards = [t["reward"] for t in host.traces[0]]
    assert any(b > a for a, b in zip(rewards, rewards[1:]))
    for h, d in zip(host.traces[0], device.traces[0]):
        assert (h["time"], h["edge"], h["index"]) == \
            (d["time"], d["edge"], d["index"])
        np.testing.assert_allclose(h["reward"], d["reward"], rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def big_value_jax(x):
    """Scores ~1500: fresh children (reward 0) sit ~1500 below their
    parent, tripping the -1000 PUCB floor — selection must recover by
    re-selecting the node with inflated visits, like the host."""
    q = jnp.round(jnp.mean(x, axis=(1, 2)) * 1e3)
    return 1500.0 + jnp.mod(q * 37.0, 7.0)


_jit_big = jax.jit(big_value_jax)


def big_value_host(x):
    return float(_jit_big(jnp.asarray(x, jnp.float32).reshape(
        1, x.shape[-2], x.shape[-1]))[0])


def test_device_floor_trip_recovery_matches_host(params):
    """The -1000 selection floor trips when reward magnitudes are O(1500);
    the host's while-loop self-recovers via visit inflation (select_p_ucb
    returns its parent-node init) — the device retry lanes must follow the
    same trajectory."""
    cfg = MCTSConfig(iterations=5, max_timesteps=8)
    host = MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG, cfg=cfg, value_fn=big_value_host,
                record_trace=True)
    device = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                        denoise=stub_denoise, model_cfg=CFG, cfg=cfg,
                        value_fn=big_value_host,
                        value_fn_jax=big_value_jax, record_trace=True)
    r = _record(seed=9)
    want = host.run_batch([r], seeds=[41])
    got = device.run_batch([r], seeds=[41])
    for h, d in zip(host.traces[0], device.traces[0]):
        assert (h["time"], h["edge"], h["index"]) == \
            (d["time"], d["edge"], d["index"])
        np.testing.assert_allclose(h["reward"], d["reward"], rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_device_search_uncached_encoder_matches_host(params):
    """cached_encoder=False (full DT forward per window, no embedding
    bank): device and host backends must still trace-match."""
    host = MCTS(dt_apply=dt_apply, dt_params=params, denoise=stub_denoise,
                model_cfg=CFG, cfg=SEARCH, value_fn=quantized_value_host,
                cached_encoder=False, record_trace=True)
    device = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                        denoise=stub_denoise, model_cfg=CFG, cfg=SEARCH,
                        value_fn=quantized_value_host,
                        value_fn_jax=quantized_value_jax,
                        cached_encoder=False, record_trace=True)
    r = _record(seed=12)
    want = host.run_batch([r], seeds=[17])
    got = device.run_batch([r], seeds=[17])
    for h, d in zip(host.traces[0], device.traces[0]):
        assert (h["time"], h["edge"], h["index"]) == \
            (d["time"], d["edge"], d["index"])
        np.testing.assert_allclose(h["reward"], d["reward"], rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_device_search_bf16_compute_runs():
    """--dtype bfloat16 on mcts (the reference's autocast policy applied
    to search): bf16 DT compute must produce a finite, PSNR-like result
    close to the f32 search's."""
    cfg16 = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                        dtype="bfloat16")
    params = init_dt_params(CFG, seed=0)

    def dt_apply16(params, rtg, states, timesteps, task, actions):
        return DecisionTransformer(cfg16).apply(
            {"params": params}, rtg, states, timesteps, task, actions)

    r = _record(seed=2)
    f32 = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                     denoise=stub_denoise, model_cfg=CFG, cfg=SEARCH,
                     value_fn=quantized_value_host,
                     value_fn_jax=quantized_value_jax)
    bf16 = DeviceMCTS(dt_apply=dt_apply16, dt_params=params,
                      denoise=stub_denoise, model_cfg=cfg16, cfg=SEARCH,
                      value_fn=quantized_value_host,
                      value_fn_jax=quantized_value_jax)
    a = f32.run_batch([r], seeds=[3], verbose=False)[0]
    b = bf16.run_batch([r], seeds=[3], verbose=False)[0]
    assert np.isfinite(b) and 0 < b < 60
    # Search decisions may legally flip under bf16 rounding; the recovered
    # quality must stay in the same band.
    assert abs(a - b) < 2.0, (a, b)


def test_device_search_bf16_node_storage_quality(params):
    """node_dtype='bfloat16' halves the dominant HBM cost of the search
    (per-node x/z/u snapshots, ~59 MB/tree in f32 at 30 iterations) while
    compute stays f32. Stored snapshots are rounded, so search decisions
    may legally flip — but the recovered quality must stay in the same
    band as the f32-storage search (round-2 verdict weak #4)."""
    r = _record(seed=2)
    f32 = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                     denoise=stub_denoise, model_cfg=CFG, cfg=SEARCH,
                     value_fn=quantized_value_host,
                     value_fn_jax=quantized_value_jax)
    b16 = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                     denoise=stub_denoise, model_cfg=CFG, cfg=SEARCH,
                     value_fn=quantized_value_host,
                     value_fn_jax=quantized_value_jax,
                     node_dtype="bfloat16")
    a = f32.run_batch([r], seeds=[3], verbose=False)[0]
    b = b16.run_batch([r], seeds=[3], verbose=False)[0]
    assert np.isfinite(b) and 0 < b < 60
    assert abs(a - b) < 2.0, (a, b)


def test_device_selection_giveup_is_surfaced(params):
    """Past the floor-recovery bound (deficit/prior >> 3: a pathological
    value scale), the device descent gives up and re-expands an internal
    node — structurally diverging from the host's unbounded visit
    inflation. That silent parity break must be SURFACED: run_batch warns
    naming the bailed trees, and the search still returns a finite score
    (advisor round 2; inference/mcts_device.py select giveup)."""
    def huge_value_jax(x):
        # O(1e9) rewards: fresh children (reward 0) sit ~1e9 below their
        # parent; recovery would need exp((1e9/prior)^2) retries.
        return 1e9 + jnp.round(jnp.mean(x, axis=(1, 2)) * 1e3)

    device = DeviceMCTS(dt_apply=dt_apply, dt_params=params,
                        denoise=stub_denoise, model_cfg=CFG,
                        cfg=MCTSConfig(iterations=3, max_timesteps=8),
                        value_fn=lambda x: 0.0,
                        value_fn_jax=huge_value_jax)
    with pytest.warns(RuntimeWarning, match=r"gave up floor recovery.*\[0\]"):
        out = device.run_batch([_record(seed=3)], seeds=[7], verbose=False)
    assert np.isfinite(out[0])


def test_run_global_batches_single_process_matches_run_batch(device):
    """The single-process fallback of run_global_batches (the CLI pod
    entry point) must equal plain chunked run_batch calls in record
    order — same trees, same seeds, same chunking."""
    records = [_record(seed=s) for s in range(5)]
    seeds = list(range(5))
    got = device.run_global_batches(records, seeds, batch_size=2)
    want = []
    for off in range(0, 5, 2):
        want += device.run_batch(records[off:off + 2],
                                 seeds=seeds[off:off + 2], verbose=False)
    assert got == want and len(got) == 5
