"""Auxiliary subsystem tests: bf16 compute policy, profiling hooks,
training resume (SURVEY.md §5)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.config import ModelConfig, TrainerConfig
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, make_dt_apply)
from dt4image_restoration_tpu.utils.profiling import (
    StepTimer, annotate, trace_if_enabled)


def _inputs(rng, b=2, t=6):
    return (
        jnp.asarray(rng.uniform(0, 1, (b, t, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, t, 128 * 128)), jnp.float32),
        jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :, None],
                         (b, t, 1)),
        jnp.asarray(rng.integers(0, 9, (b, t)), jnp.int32),
        jnp.asarray(rng.uniform(0, 1, (b, t, 3)), jnp.float32),
    )


def test_bf16_forward_close_to_f32(rng):
    params = init_dt_params(ModelConfig(block_size=18, n_embeds=9), seed=0)
    args = _inputs(rng)
    out32 = make_dt_apply(ModelConfig(block_size=18, n_embeds=9))(
        params, *args)
    out16 = make_dt_apply(
        ModelConfig(block_size=18, n_embeds=9, dtype="bfloat16"))(
        params, *args)
    assert out16.pred_actions.dtype == jnp.float32  # heads cast back
    np.testing.assert_allclose(np.asarray(out16.pred_actions),
                               np.asarray(out32.pred_actions),
                               rtol=0.05, atol=0.03)


def test_step_timer():
    timer = StepTimer()
    for _ in range(3):
        with timer:
            pass
    s = timer.summary()
    assert s["steps"] == 3 and s["total_s"] >= 0


def test_trace_if_enabled_noop(monkeypatch):
    monkeypatch.delenv("DT4IR_TRACE_DIR", raising=False)
    with trace_if_enabled():
        pass  # no trace dir -> no-op


def test_trace_capture(tmp_path):
    with trace_if_enabled(str(tmp_path / "trace")):
        with annotate("unit-test-span"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert os.path.isdir(tmp_path / "trace")


def test_trainer_resume(tmp_path, rng):
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_optimizer, make_train_step)

    cfg = ModelConfig(block_size=18, n_embeds=9, dropout=0.0,
                      embd_dropout=0.0)
    params = init_dt_params(cfg, seed=0)
    tcfg = TrainerConfig(max_epochs=1, save_every=1, batch_size=2)
    optimizer = make_optimizer(tcfg, max_steps=10, params=params)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

    def batches(_):
        r, s, ts, task, a = _inputs(rng)
        yield {"rtg": np.asarray(r), "states": np.asarray(s),
               "timesteps": np.asarray(ts), "task": np.asarray(task),
               "actions": np.asarray(a),
               "traj_masks": np.ones((2, 6, 1), np.float32)}

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(train_step=step_fn, state=state, config=tcfg,
                      batches=batches, shard=lambda b: b,
                      checkpoint_dir=str(tmp_path))
    final = trainer.train()
    assert int(final.step) == 1
    assert os.path.isdir(tmp_path / "state_latest")

    # Second trainer resumes at step 1 and continues to step 2.
    params2 = init_dt_params(cfg, seed=1)
    state2 = TrainState(params=params2, opt_state=optimizer.init(params2),
                        step=jnp.zeros((), jnp.int32))
    trainer2 = Trainer(train_step=step_fn, state=state2, config=tcfg,
                       batches=batches, shard=lambda b: b,
                       checkpoint_dir=None,
                       resume_from=str(tmp_path / "state_latest"))
    final2 = trainer2.train()
    assert int(final2.step) == 2


def test_trainer_async_save_roundtrip(tmp_path, rng):
    """Trainer(async_save=True): epoch checkpoints go through the
    background saver, _finalize drains the queue, and the written
    state_latest restores to EXACTLY the returned final state (including
    the drain-before-preemption-save ordering rule)."""
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_optimizer, make_train_step)
    from dt4image_restoration_tpu.utils.checkpoint import (
        restore_checkpoint)

    cfg = ModelConfig(block_size=18, n_embeds=9, dropout=0.0,
                      embd_dropout=0.0)
    params = init_dt_params(cfg, seed=0)
    tcfg = TrainerConfig(max_epochs=2, save_every=1, batch_size=2)
    optimizer = make_optimizer(tcfg, max_steps=10, params=params)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

    def batches(_):
        r, s, ts, task, a = _inputs(rng)
        yield {"rtg": np.asarray(r), "states": np.asarray(s),
               "timesteps": np.asarray(ts), "task": np.asarray(task),
               "actions": np.asarray(a),
               "traj_masks": np.ones((2, 6, 1), np.float32)}

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(train_step=step_fn, state=state, config=tcfg,
                      batches=batches, shard=lambda b: b,
                      checkpoint_dir=str(tmp_path), async_save=True)
    final = trainer.train()
    assert int(final.step) == 2
    assert os.path.isdir(tmp_path / "model_0")  # epochs are 0-indexed
    assert os.path.isdir(tmp_path / "model_1")
    restored = restore_checkpoint(str(tmp_path / "state_latest"),
                                  like=jax.device_get(final))
    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        restored.params["predict_action"]["kernel"],
        np.asarray(final.params["predict_action"]["kernel"]))


@pytest.mark.parametrize("async_save", [False, True])
def test_trainer_keep_last_retention(tmp_path, rng, async_save):
    """keep_last retains only the newest N model_<epoch> dirs (sync and
    async — async GC is queued behind the epoch's saves); state_latest
    survives and restores to the final step."""
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_optimizer, make_train_step)
    from dt4image_restoration_tpu.utils.checkpoint import (
        restore_checkpoint)

    cfg = ModelConfig(block_size=18, n_embeds=9, dropout=0.0,
                      embd_dropout=0.0)
    params = init_dt_params(cfg, seed=0)
    tcfg = TrainerConfig(max_epochs=3, save_every=1, batch_size=2)
    optimizer = make_optimizer(tcfg, max_steps=10, params=params)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

    def batches(_):
        r, s, ts, task, a = _inputs(rng)
        yield {"rtg": np.asarray(r), "states": np.asarray(s),
               "timesteps": np.asarray(ts), "task": np.asarray(task),
               "actions": np.asarray(a),
               "traj_masks": np.ones((2, 6, 1), np.float32)}

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(train_step=step_fn, state=state, config=tcfg,
                      batches=batches, shard=lambda b: b,
                      checkpoint_dir=str(tmp_path), async_save=async_save,
                      keep_last=2)
    final = trainer.train()
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("model_"))
    assert kept == ["model_1", "model_2"]
    restored = restore_checkpoint(str(tmp_path / "state_latest"),
                                  like=jax.device_get(final))
    assert int(restored.step) == int(final.step) == 3

    with pytest.raises(ValueError, match="keep_last"):
        Trainer(train_step=step_fn, state=state, config=tcfg,
                batches=batches, shard=lambda b: b, keep_last=0)


def test_async_checkpoint_saver_orders_and_raises(tmp_path):
    """AsyncCheckpointSaver: overlapping saves to ONE path land in
    submission order (last write wins), and a worker failure re-raises on
    wait() instead of silently losing the checkpoint."""
    import pytest

    from dt4image_restoration_tpu.utils.checkpoint import (
        AsyncCheckpointSaver, restore_checkpoint)

    saver = AsyncCheckpointSaver()
    p = str(tmp_path / "ck")
    for v in (1.0, 2.0, 3.0):
        saver.submit(p, {"w": np.full((4,), v, np.float32)})
    saver.wait()
    np.testing.assert_array_equal(restore_checkpoint(p)["w"],
                                  np.full((4,), 3.0, np.float32))

    saver.submit("/proc/definitely/not/writable/ck", {"w": np.ones(2)})
    with pytest.raises(Exception):
        saver.wait()
    saver.close()


def test_trainer_preemption_checkpoint(tmp_path, rng):
    """SIGTERM mid-training (TPU preemption) saves full resume state at the
    next step boundary and returns cleanly; a fresh trainer resumes from
    exactly that step."""
    import os as _os
    import signal

    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_optimizer, make_train_step)

    cfg = ModelConfig(block_size=18, n_embeds=9, dropout=0.0,
                      embd_dropout=0.0)
    params = init_dt_params(cfg, seed=0)
    tcfg = TrainerConfig(max_epochs=1, save_every=5, batch_size=2)
    optimizer = make_optimizer(tcfg, max_steps=10, params=params)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

    def one_batch():
        r, s, ts, task, a = _inputs(rng)
        return {"rtg": np.asarray(r), "states": np.asarray(s),
                "timesteps": np.asarray(ts), "task": np.asarray(task),
                "actions": np.asarray(a),
                "traj_masks": np.ones((2, 6, 1), np.float32)}

    def batches(_):
        yield one_batch()
        yield one_batch()
        # Preemption arrives while assembling the third batch.
        _os.kill(_os.getpid(), signal.SIGTERM)
        yield one_batch()
        yield one_batch()

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(train_step=step_fn, state=state, config=tcfg,
                      batches=batches, shard=lambda b: b,
                      checkpoint_dir=str(tmp_path))
    final = trainer.train()
    # Stopped early (4 batches queued; the signal lands by batch 3) and the
    # resume checkpoint exists even though save_every epochs never elapsed.
    assert int(final.step) < 4
    assert os.path.isdir(tmp_path / "state_latest")

    state2 = TrainState(params=init_dt_params(cfg, seed=1),
                        opt_state=optimizer.init(params),
                        step=jnp.zeros((), jnp.int32))
    trainer2 = Trainer(train_step=step_fn, state=state2, config=tcfg,
                       batches=lambda _: iter([one_batch()]),
                       shard=lambda b: b, checkpoint_dir=None,
                       resume_from=str(tmp_path / "state_latest"))
    final2 = trainer2.train()
    assert int(final2.step) == int(final.step) + 1


def test_trainer_watch_logs_param_and_grad_histograms(rng):
    """The wandb.watch(model) equivalent (reference train.py:138): on
    watch steps the trainer logs per-leaf parameter AND gradient
    histograms, and the logged gradients are the real jax.grad of the
    step's loss at the PRE-update params (fetched before the donated
    update invalidates them)."""
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_optimizer, make_train_step)
    from dt4image_restoration_tpu.training.trainer import (
        loss_fn, make_watch_grad_fn)

    cfg = ModelConfig(block_size=18, n_embeds=9, dropout=0.0,
                      embd_dropout=0.0)
    params = init_dt_params(cfg, seed=0)
    tcfg = TrainerConfig(max_epochs=1, save_every=10**9, batch_size=2,
                         watch_every=1)
    optimizer = make_optimizer(tcfg, max_steps=10, params=params)
    dt_apply = make_dt_apply(cfg, train=True)
    step_fn = make_train_step(dt_apply, optimizer)

    r, s, ts, task, a = _inputs(rng)
    batch = {"rtg": np.asarray(r), "states": np.asarray(s),
             "timesteps": np.asarray(ts), "task": np.asarray(task),
             "actions": np.asarray(a),
             "traj_masks": np.ones((2, 6, 1), np.float32)}

    class FakeWandb:
        def __init__(self):
            self.payloads = []

        class Histogram:
            def __init__(self, values):
                self.values = np.asarray(values)
                assert np.all(np.isfinite(self.values))

        def log(self, payload):
            self.payloads.append(payload)

        def finish(self):
            pass

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(train_step=step_fn, state=state, config=tcfg,
                      batches=lambda _: iter([dict(batch)]),
                      shard=lambda b: b, checkpoint_dir=None,
                      watch_grad_fn=make_watch_grad_fn(dt_apply))
    fake = FakeWandb()
    trainer._wandb = fake
    trainer.train()

    watch = [p for p in fake.payloads
             if any(k.startswith("parameters/") for k in p)]
    assert len(watch) == 1  # watch_every=1, one step
    names = set(watch[0])
    assert any(n.startswith("gradients/") for n in names)
    # Same leaf set under both prefixes.
    p_leaves = {n.split("/", 1)[1] for n in names
                if n.startswith("parameters/")}
    g_leaves = {n.split("/", 1)[1] for n in names
                if n.startswith("gradients/")}
    assert p_leaves == g_leaves and len(p_leaves) > 10

    # The logged gradient equals jax.grad at the pre-update params with
    # the trainer's step rng (first split of PRNGKey(seed)).
    step_rng = jax.random.split(jax.random.PRNGKey(tcfg.seed))[1]
    want = jax.grad(lambda p: loss_fn(dt_apply, p, batch, step_rng))(params)
    leaf = sorted(p_leaves)[0]

    def lookup(tree, dotted):
        for part in dotted.split("/"):
            tree = tree[part]
        return tree

    got = watch[0][f"gradients/{leaf}"].values
    np.testing.assert_allclose(
        got, np.asarray(lookup(want, leaf), np.float32).ravel(),
        rtol=1e-5, atol=1e-7)


def test_tpu_probe_backend_guard(monkeypatch, capsys):
    """ensure_live_backend (shared by every standalone bench/demo script)
    never lets a first device touch hang: already-CPU environments skip
    the subprocess probe entirely, a DEAD probe (tunnel outage) flips the
    backend with tpu_unreachable flagged, and a healthy non-TPU backend is
    NOT an outage (left untouched, no flag)."""
    from dt4image_restoration_tpu.utils import tpu_probe

    # Suite env: conftest already forced jax_platforms=cpu -> forced path,
    # no subprocess probe (which costs its full timeout during outages).
    monkeypatch.setattr(tpu_probe, "probe_backend",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe must not run when "
                                           "already on CPU")))
    on_cpu, unreachable = tpu_probe.ensure_live_backend(argv=[])
    assert on_cpu is True and unreachable is False

    # --cpu flag forces the same without consulting the environment.
    on_cpu, unreachable = tpu_probe.ensure_live_backend(argv=["x", "--cpu"])
    assert on_cpu is True and unreachable is False

    # Outage path: nothing forces CPU and the probe DIES -> fallback with
    # tpu_unreachable True (and a stderr note).
    monkeypatch.setattr(tpu_probe, "_env_forces_cpu", lambda: False)
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: None)
    on_cpu, unreachable = tpu_probe.ensure_live_backend(argv=[])
    assert on_cpu is True and unreachable is True
    assert "unreachable" in capsys.readouterr().err

    # Healthy non-TPU default backends answer the probe: plain-CPU runs
    # report on_cpu without the outage flag; a live GPU is kept.
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: "cpu")
    assert tpu_probe.ensure_live_backend(argv=[]) == (True, False)
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: "gpu")
    assert tpu_probe.ensure_live_backend(argv=[]) == (False, False)
    assert "unreachable" not in capsys.readouterr().err


def test_eval_bench_smoke(monkeypatch, capsys):
    """benchmarks/eval_bench.py end-to-end at toy sizes (CPU): every
    config (greedy, flex, host/batched/device MCTS, ARNIQA-embedded,
    full-30 regime, bf16 quality, node-dtype knee) wires up and the JSON
    line carries the expected keys — guards the TPU sweep against rot in
    a script nothing else executes."""
    import json as json_mod
    import benchmarks.eval_bench as bench

    monkeypatch.setattr(bench, "N_IMAGES", 2)
    monkeypatch.setattr(bench, "MAX_T", 6)  # must cover context_length
    monkeypatch.setattr(bench, "SEARCH_ITERS", 2)
    monkeypatch.setattr(bench, "IMAGE_SIZE", 32)
    monkeypatch.setattr(bench, "TREE_BATCHES", (3,))
    monkeypatch.setattr(bench, "EVAL_BATCHES", (3,))
    monkeypatch.setattr(bench, "KNEE_BATCHES", (3,))
    monkeypatch.setattr("sys.argv", ["eval_bench.py"])
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("greedy_eval_7img_s", "flex_eval_7img_s", "mcts_30iter_s",
              "mcts_batched_s_per_image", "mcts_device_s_per_image",
              "mcts_device_s_per_image_b3", "mcts_device_arniqa_s_per_image",
              "greedy_eval_full30_7img_s",
              "greedy_eval_full30_images_per_sec_b3",
              "greedy_eval_full30_bf16_psnr_delta_db",
              "mcts_device_full30_bf16_psnr_delta_db",
              "mcts_device_full30_nodebf16_psnr_delta_db",
              "mcts_device_f32_s_per_image_b3",
              "mcts_device_nodebf16_s_per_image_b3"):
        assert k in r, k


def test_train_bench_smoke(monkeypatch, capsys):
    """benchmarks/train_bench.py at toy sizes (CPU): the fused donated
    train step compiles and times in f32 AND bf16, one JSON line."""
    import json as json_mod
    import benchmarks.train_bench as bench

    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "IMAGE_SIZE", 32)
    monkeypatch.setattr(bench, "REPS", 2)
    monkeypatch.setattr("sys.argv", ["train_bench.py"])
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("train_step_ms_f32", "train_step_ms_bf16",
              "train_samples_per_sec_f32", "train_samples_per_sec_bf16"):
        assert r[k] > 0


def test_conv_probe_smoke(monkeypatch, capsys):
    """benchmarks/conv_probe.py at toy sizes (CPU): the exactness asserts
    of every conv rewrite run, both block A/Bs and one fused-Pallas config
    (interpret mode) produce entries, one JSON line."""
    import json as json_mod
    import benchmarks.conv_probe as bench

    monkeypatch.setenv("PROBE_BATCH", "2")
    monkeypatch.setattr(bench, "LOOP_LO", 1)
    monkeypatch.setattr(bench, "LOOP_HI", 3)
    monkeypatch.setattr(bench, "BLOCKS", (("inc", 16, 3, 4),))
    monkeypatch.setattr(bench, "PALLAS_CONFIGS",
                        (("f32", (2, 8, 16, "increal")),))
    monkeypatch.setattr("sys.argv", ["conv_probe.py"])
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rewrites_correct"] is True
    for k in ("inc_f32_direct_us", "inc_f32_s2dshift_speedup",
              "inc_bf16_s2ddense_speedup"):
        assert k in r, k
    assert ("increal_f32_pallas_us" in r
            or "increal_f32_pallas_error" in r)


def test_policy_learning_demo_smoke(monkeypatch, capsys):
    """benchmarks/policy_learning_demo.py end-to-end at toy sizes (CPU):
    record -> train -> held-out greedy eval -> device search -> one JSON
    line. Guards the demo's wiring (a recorder refactor once left an
    undefined name on the eval path, crashing after training)."""
    import json as json_mod
    import benchmarks.policy_learning_demo as demo

    monkeypatch.setattr(demo, "N_TRAJ", 2)
    monkeypatch.setattr(demo, "EP_LEN", 2)
    monkeypatch.setattr(demo, "TRAIN_STEPS", 2)
    monkeypatch.setattr(demo, "BATCH", 2)
    monkeypatch.setattr(demo, "HELD_OUT", 1)
    monkeypatch.setattr(demo, "SEARCH_ITERS", 2)
    monkeypatch.setattr(demo, "IMAGE_SIZE", 32)
    monkeypatch.setattr("sys.argv", ["policy_learning_demo.py"])
    demo.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("expert_increment_db", "loss_last10", "trained_increment_db",
              "random_init_increment_db", "trained_mcts_increment_db"):
        assert k in r, k
    assert r["train_steps"] == 2


def test_input_pipeline_bench_smoke(monkeypatch, capsys):
    """benchmarks/input_pipeline_bench.py end-to-end on a tiny corpus
    (CPU): corpus build -> TrainingDataset -> warm (both donated-state
    signatures) -> interleaved sections -> one JSON line. Guards the
    bench's trainer-path wiring (a donated TrainState was once reused
    across sections and died with 'Array has been deleted')."""
    import json as json_mod
    import benchmarks.input_pipeline_bench as bench

    monkeypatch.setattr(bench, "N_TRAJ", 12)
    monkeypatch.setattr(bench, "BATCH", 4)
    monkeypatch.setattr(bench, "EPOCH_REPS", 1)
    monkeypatch.setattr("sys.argv", ["input_pipeline_bench.py", "--cpu"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    r = json_mod.loads(out)
    assert r["steps_per_epoch"] >= 1
    for k in ("input_only_s", "input_native_s", "device_only_s",
              "transfer_step_s", "epoch_wall_s", "epoch_native_s",
              "overlap_efficiency", "overlap_efficiency_native",
              "preload_upfront_s"):
        assert r[k] >= 0
    assert r["native_loader"] is True  # g++ is baked into the image


def test_headline_bench_smoke(monkeypatch, capsys):
    """bench.py end-to-end at toy sizes (CPU): every A/B variant
    compiles and runs, the JSON line parses, and the required keys are
    present — guards the driver's round-end artifact against wiring
    regressions in the sweep paths."""
    import json as json_mod
    import bench

    monkeypatch.setattr(bench, "N_ITERS", 2)
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "SCALING_BATCHES", (4,))
    monkeypatch.setattr(bench, "KNEE_REP_BUDGET", 8)
    monkeypatch.setattr(bench, "SINGLE_REPEATS", 2)
    monkeypatch.setattr(bench, "BATCH_REPEATS", 2)
    monkeypatch.setattr(bench, "PALLAS_KNEE_BATCH", 4)  # cover the knee A/B
    # Pin the knee soft deadline out of the way: a cache-cold 1-core CI
    # host can legitimately cross 420 s of wall in phase 1, which would
    # skip the knee extras asserted below (deadline-skip wiring itself is
    # phase 2's subject).
    monkeypatch.setattr(bench, "PALLAS_KNEE_DEADLINE_S", 1e9)
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["metric"] == "pnp_admm_iters_per_sec_per_chip"
    assert r["value"] > 0 and r["vs_baseline"] > 0
    e = r["extras"]
    for k in ("psnr_parity_delta_db", "psnr_bf16_delta_db",
              "batched_slices_per_sec_b4", "bf16_slices_per_sec_b4",
              "unet_packed_adopted", "unet_variant_adopted"):
        assert k in e
    # The fused-Pallas candidate must run (interpret mode on CPU), pass
    # the parity gate, and report its knee-point throughput.
    assert e["pallas_ok"] is True
    assert e["pallas_psnr_delta_db"] < 0.01
    assert e["pallas_iters_per_sec"] > 0
    assert e["pallas_slices_per_sec_b4"] > 0
    assert e["pallas_bf16_slices_per_sec_b4"] > 0  # bf16 knee candidate
    # The Winograd MAC-reduction candidate: same parity gate, same knee
    # A/B (f32 + bf16).
    assert e["winograd_ok"] is True
    assert e["winograd_psnr_delta_db"] < 0.01
    assert e["winograd_iters_per_sec"] > 0
    assert e["winograd_slices_per_sec_b4"] > 0
    assert e["winograd_bf16_slices_per_sec_b4"] > 0
    # Under the suite's forced-CPU env the tunnel probe is skipped.
    assert e["tpu_unreachable"] is False
    # PSNR parity must hold at toy sizes too (identical weights/data).
    assert abs(e["psnr_parity_delta_db"]) < 0.05

    # Phase 2 — deadline-skip wiring: with the knee deadline already
    # exceeded the B-knee fused extras are skipped but the artifact still
    # completes with every non-knee key (cheap: all programs are warm
    # from phase 1).
    monkeypatch.setattr(bench, "PALLAS_KNEE_DEADLINE_S", -1.0)
    bench.main()
    r2 = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    e2 = r2["extras"]
    assert r2["value"] > 0
    assert "batched_slices_per_sec_b4" in e2
    assert "pallas_slices_per_sec_b4" not in e2
    assert "pallas_bf16_slices_per_sec_b4" not in e2
    assert "winograd_slices_per_sec_b4" not in e2  # same deadline gate
    assert e2["pallas_ok"] is True  # single-slice A/B is not deadline-gated
    assert e2["winograd_ok"] is True


def test_headline_bench_tunnel_outage_fallback(monkeypatch, capsys):
    """When the TPU probe fails (axon tunnel down: jax.devices() HANGS
    rather than erroring), bench.py must still emit its JSON line on CPU
    with tpu_unreachable flagged — the driver's round-end artifact must
    never hang."""
    import json as json_mod
    import bench

    monkeypatch.setattr(bench, "N_ITERS", 2)
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "SCALING_BATCHES", (4,))
    monkeypatch.setattr(bench, "KNEE_REP_BUDGET", 8)
    monkeypatch.setattr(bench, "SINGLE_REPEATS", 2)
    monkeypatch.setattr(bench, "BATCH_REPEATS", 2)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)  # force the probe
    from dt4image_restoration_tpu.utils import tpu_probe
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: None)
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["extras"]["tpu_unreachable"] is True
    assert r["extras"]["platform"] == "cpu"
    assert r["value"] > 0
    # Outage fallbacks run the bounded degraded body (direct-only, no
    # knee sweep): a full CPU sweep at real sizes would blow the driver's
    # round-end budget just to produce a fallback artifact.
    assert r["extras"]["degraded"] is True
    assert "bf16_iters_per_sec" not in r["extras"]


def test_headline_bench_exec_fault_fallback(monkeypatch, capsys):
    """BENCH_r04's loss mode, injected: the probe answers 'tpu' but every
    device child run fails on execution. main() must retry once on the
    same backend, then fall back to a degraded in-process CPU run — and
    still emit one parseable JSON line recording both failures."""
    import json as json_mod
    import bench

    monkeypatch.setattr(bench, "N_ITERS", 2)
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "SINGLE_REPEATS", 2)
    monkeypatch.setattr(bench, "BATCH_REPEATS", 2)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)  # take the device path
    from dt4image_restoration_tpu.utils import tpu_probe
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: "tpu")
    calls = []

    def failing_child(timeout_s=None):
        calls.append(timeout_s)
        return None, "child rc=1; stderr tail: 'FAILED_PRECONDITION: " \
                     "TPU backend error'"

    monkeypatch.setattr(bench, "_child_run", failing_child)
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(calls) == 2  # one retry (fast failure + live probe), no more
    assert r["value"] > 0  # degraded CPU numbers are real measurements
    e = r["extras"]
    assert e["tpu_unreachable"] is False
    assert "FAILED_PRECONDITION" in e["tpu_error"]
    assert len(e["tpu_errors"]) == 2
    assert e["degraded"] is True
    assert e["platform"] == "cpu"


def test_headline_bench_retry_succeeds(monkeypatch, capsys):
    """A transient device fault: the first child run fails fast, the
    retry succeeds — the retried child's JSON line is emitted with the
    retry provenance merged into extras."""
    import json as json_mod
    import bench

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    from dt4image_restoration_tpu.utils import tpu_probe
    monkeypatch.setattr(tpu_probe, "probe_backend", lambda *a, **k: "tpu")
    good_line = json_mod.dumps({
        "metric": "pnp_admm_iters_per_sec_per_chip", "value": 5.0,
        "unit": "iters/s", "vs_baseline": 2.0,
        "extras": {"platform": "tpu"}})
    seq = [(None, "transient fault"), (good_line, None)]
    monkeypatch.setattr(bench, "_child_run",
                        lambda timeout_s=None: seq.pop(0))
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["value"] == 5.0
    assert r["extras"]["platform"] == "tpu"
    assert r["extras"]["tpu_retry"] is True
    assert "transient fault" in r["extras"]["tpu_first_error"]
    assert r["extras"]["tpu_unreachable"] is False


def test_headline_bench_no_retry_when_probe_dies(monkeypatch, capsys):
    """After a failed device run, the retry is skipped when the re-probe
    dies (a mid-run tunnel drop would HANG the retry, not error) — main
    goes straight to the CPU fallback."""
    import json as json_mod
    import bench

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    from dt4image_restoration_tpu.utils import tpu_probe
    probes = ["tpu", None]  # healthy at first, dead on the re-probe
    monkeypatch.setattr(tpu_probe, "probe_backend",
                        lambda *a, **k: probes.pop(0))
    calls = []

    def failing_child(timeout_s=None):
        calls.append(1)
        return None, "child timeout after 1500s (hang signature)"

    monkeypatch.setattr(bench, "_child_run", failing_child)
    fallbacks = []

    def fake_fallback(extras, degraded):
        fallbacks.append((dict(extras), degraded))
        print(json_mod.dumps({"metric": "pnp_admm_iters_per_sec_per_chip",
                              "value": 1.0, "unit": "iters/s",
                              "vs_baseline": 1.0, "extras": extras}))

    monkeypatch.setattr(bench, "_guarded_cpu_run", fake_fallback)
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(calls) == 1  # no blind retry into a hang
    assert fallbacks[0][1] is True  # degraded fallback
    assert "hang signature" in r["extras"]["tpu_error"]


def test_headline_bench_last_resort_line(monkeypatch, capsys):
    """Absolute artifact guarantee: even when the measurement body itself
    raises on CPU, main() returns normally and prints a parseable JSON
    line (value 0.0 = honestly no measurement, error recorded)."""
    import json as json_mod
    import bench

    def boom(extras=None, degraded=False):
        raise RuntimeError("synthetic CPU-path bug")

    monkeypatch.setattr(bench, "_run", boom)
    bench.main()  # suite env forces the in-process CPU path
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["metric"] == "pnp_admm_iters_per_sec_per_chip"
    assert r["value"] == 0.0 and r["vs_baseline"] == 0.0
    assert "synthetic CPU-path bug" in r["extras"]["error"]


def test_probe_requires_execution(tmp_path, monkeypatch):
    """The probe must EXECUTE a jitted computation, not just enumerate
    devices: a fake jax that enumerates fine but throws on execution
    (BENCH_r04's signature) must read as a dead probe, and a healthy fake
    must report its platform."""
    import os
    import textwrap
    from dt4image_restoration_tpu.utils import tpu_probe

    pkg = tmp_path / "jax"
    pkg.mkdir()
    (pkg / "__init__.py").write_text(textwrap.dedent("""
        import os

        class _Dev:
            platform = "tpu"

        def devices():
            return [_Dev()]

        class _Res:
            def block_until_ready(self):
                return self

        def jit(f):
            def wrapped(*a, **k):
                if os.environ.get("FAKE_JAX_FAIL_EXEC") == "1":
                    raise RuntimeError(
                        "FAILED_PRECONDITION: TPU backend error")
                return _Res()
            return wrapped

        from . import numpy  # noqa: F401  (so `import jax.numpy` works)
    """))
    (pkg / "numpy.py").write_text("def zeros(*a, **k):\n    return 0\n")

    # Shadow the real jax in probe children; keep /root/.axon_site on the
    # path but disarm its register() (it is gated on PALLAS_AXON_POOL_IPS).
    monkeypatch.setenv("PYTHONPATH", str(tmp_path) + os.pathsep
                       + os.environ.get("PYTHONPATH", ""))
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)

    monkeypatch.setenv("FAKE_JAX_FAIL_EXEC", "1")
    assert tpu_probe.probe_backend(timeout_s=60) is None
    monkeypatch.setenv("FAKE_JAX_FAIL_EXEC", "0")
    assert tpu_probe.probe_backend(timeout_s=60) == "tpu"


def test_serving_bench_smoke(monkeypatch, capsys):
    """benchmarks/serving_bench.py end-to-end at toy sizes (CPU): policy
    throughput + single-request latency + concurrent-client percentiles +
    mcts mode all produce finite numbers in one JSON line."""
    import json as json_mod
    import benchmarks.serving_bench as bench

    monkeypatch.setattr(bench, "POLICY_BATCH", 2)
    monkeypatch.setattr(bench, "POLICY_LOAD", 4)
    monkeypatch.setattr(bench, "N_CLIENTS", 2)
    monkeypatch.setattr(bench, "REQS_PER_CLIENT", 2)
    monkeypatch.setattr(bench, "MCTS_BATCH", 2)
    monkeypatch.setattr(bench, "MAX_TIMESTEPS", 8)
    monkeypatch.setattr(bench, "MCTS_ITERATIONS", 2)
    monkeypatch.setattr("sys.argv", ["serving_bench.py", "--cpu"])
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("serving_policy_requests_per_sec",
              "serving_policy_single_latency_ms",
              "serving_policy_concurrent_p50_ms",
              "serving_policy_concurrent_p95_ms",
              "serving_policy_concurrent_p99_ms",
              "serving_policy_concurrent_requests_per_sec",
              "serving_policy_concurrent_p95_over_p50",
              "serving_policy_legacy_concurrent_p50_ms",
              "serving_policy_legacy_concurrent_p95_ms",
              "serving_policy_legacy_concurrent_requests_per_sec",
              "serving_policy_pipelined_requests_per_sec",
              "serving_mcts_requests_per_sec"):
        assert r[k] > 0
    assert (r["serving_policy_concurrent_p99_ms"]
            >= r["serving_policy_concurrent_p50_ms"])


def test_tpu_probe_times_out_fast():
    """A hung backend init must be bounded by the probe timeout (a killed
    child reads as a dead probe, not a live non-TPU backend)."""
    from dt4image_restoration_tpu.utils import tpu_probe
    assert tpu_probe.probe_backend(timeout_s=0.05) is None


def test_search_knee_profile_smoke(monkeypatch, capsys):
    """benchmarks/search_knee_profile.py at toy sizes (CPU): every
    component slope produces a finite number and the JSON line carries
    the attribution keys for each batch point."""
    import json as json_mod
    import benchmarks.search_knee_profile as bench

    monkeypatch.setattr(bench, "BATCHES", (2,))
    monkeypatch.setattr(bench, "ITER_LO", 1)
    monkeypatch.setattr(bench, "ITER_HI", 3)
    monkeypatch.setattr(bench, "LOOP_LO", 1)
    monkeypatch.setattr(bench, "LOOP_HI", 3)
    monkeypatch.setattr(bench, "MAX_TIMESTEPS", 6)
    monkeypatch.setattr(bench, "IMAGE_SIZE", 32)
    monkeypatch.setattr(bench, "REPS", 1)
    monkeypatch.setattr("sys.argv", ["search_knee_profile.py"])
    bench.main()
    r = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["metric"] == "search_knee_attribution"
    for k in ("full_iter_ms_b2", "iter_ms_b2", "policy_ms_b2",
              "expand_ms_b2", "rollout_ms_b2", "bookkeeping_ms_b2",
              "component_sum_ms_b2", "s_per_image_implied_b2"):
        assert k in r and np.isfinite(r[k]), k
    assert r["expand_lanes_b2"] == 12  # (K+1) * B


def test_bench_child_run_protocol(tmp_path, monkeypatch, capsys):
    """_child_run spawns `<bench.__file__> --child`, pumps the child's
    stderr live to the parent's stderr (driver observability), parses
    the last stdout line as the JSON artifact on rc=0, and classifies
    failures with the stderr tail."""
    import json as json_mod
    import bench

    good = tmp_path / "good_child.py"
    good.write_text(
        "import json, sys\n"
        "print('[bench-section] fake: 1.0s', file=sys.stderr)\n"
        "print('noise line')\n"
        "print(json.dumps({'metric': 'm', 'value': 1.0}))\n")
    monkeypatch.setattr(bench, "__file__", str(good))
    line, err = bench._child_run(timeout_s=60)
    assert err is None
    assert json_mod.loads(line)["value"] == 1.0
    assert "[bench-section] fake" in capsys.readouterr().err

    bad = tmp_path / "bad_child.py"
    bad.write_text(
        "import sys\n"
        "print('FAILED_PRECONDITION: TPU backend error', file=sys.stderr)\n"
        "sys.exit(1)\n")
    monkeypatch.setattr(bench, "__file__", str(bad))
    line, err = bench._child_run(timeout_s=60)
    assert line is None
    assert "rc=1" in err and "FAILED_PRECONDITION" in err

    hang = tmp_path / "hang_child.py"
    hang.write_text("import time\ntime.sleep(600)\n")
    monkeypatch.setattr(bench, "__file__", str(hang))
    line, err = bench._child_run(timeout_s=2)
    assert line is None
    assert "hang signature" in err


def test_measure_queue_lands_and_is_restartable(tmp_path, monkeypatch,
                                                capsys):
    """tools/measure.py: benches land when their last stdout line parses
    as JSON, .done markers make re-invocation skip them, and a bench
    that never emits JSON bounds out via --max-wall with rc 1."""
    import tools.measure as measure

    monkeypatch.setattr(measure, "probe", lambda *a, **k: True)
    out = str(tmp_path / "m")
    ok = 'ok:60:echo {\\"metric\\": 1}'
    rc = measure.main([ok, "--out", out, "--max-wall", "60"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "ok.done"))
    import json as _json
    assert _json.loads(open(os.path.join(out, "ok.json")).read()
                       .strip().splitlines()[-1]) == {"metric": 1}

    # Restartable: completed benches are skipped (a failing command in
    # the same queue would otherwise run), and a no-JSON bench retries
    # until --max-wall then exits 1 without touching the done marker.
    bad = "bad:60:echo not-json"
    rc = measure.main([ok, bad, "--out", out, "--max-wall", "3"])
    assert rc == 1
    assert not os.path.exists(os.path.join(out, "bad.done"))
    assert os.path.exists(os.path.join(out, "ok.done"))


def test_measure_probe_gates_and_sleeps(tmp_path, monkeypatch):
    """A dead probe never launches the bench; the queue sleeps and
    re-probes until --max-wall."""
    import tools.measure as measure

    calls = {"probe": 0}

    def dead_probe(*a, **k):
        calls["probe"] += 1
        return False

    monkeypatch.setattr(measure, "probe", dead_probe)
    monkeypatch.setattr(measure.time, "sleep", lambda s: None)
    out = str(tmp_path / "m2")
    marker = tmp_path / "ran"
    rc = measure.main([f"b:60:touch {marker}", "--out", out,
                       "--max-wall", "0.2", "--down-sleep", "0.01"])
    assert rc == 1
    assert calls["probe"] >= 1
    assert not marker.exists()
