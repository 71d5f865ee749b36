"""Training-step throughput (the reference's train path, train.py:75-119,
at its canonical config: batch 48, 6-timestep windows, 128x128 states).

Measures the fused donated train_step (forward + masked MSE + backward +
clip + AdamW as one XLA program) in f32 and bf16 on the default device,
pipelining N dispatches and fetching only the final loss (tunnel-safe
timing, see bench.py).

Run on TPU:  python benchmarks/train_bench.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 48
T = 6
IMAGE_SIZE = 128
REPS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.config import ModelConfig, TrainerConfig
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.training import (
        TrainState, make_optimizer, make_train_step)

    results = {"platform": jax.devices()[0].platform, "batch": BATCH,
               "tpu_unreachable": tpu_unreachable}
    rng = np.random.default_rng(0)
    batch = {
        "states": rng.uniform(
            0, 1, (BATCH, T, IMAGE_SIZE * IMAGE_SIZE)).astype(np.float32),
        "actions": rng.uniform(0, 1, (BATCH, T, 3)).astype(np.float32),
        "rtg": rng.uniform(0, 1, (BATCH, T, 1)).astype(np.float32),
        "traj_masks": np.ones((BATCH, T, 1), np.float32),
        "timesteps": np.broadcast_to(
            np.arange(T, dtype=np.int32)[None, :, None],
            (BATCH, T, 1)).copy(),
        "task": rng.integers(0, 9, (BATCH, T)).astype(np.int32),
    }
    tcfg = TrainerConfig(warmup_steps=1250, learning_rate=3e-4)

    for dtype in ("float32", "bfloat16"):
        cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                          dtype=dtype, image_size=IMAGE_SIZE)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = jax.device_get(init_dt_params(cfg, seed=0))
        optimizer = make_optimizer(tcfg, max_steps=10_000, params=params)
        step = make_train_step(make_dt_apply(cfg, train=True), optimizer)
        state = TrainState(params=params,
                           opt_state=optimizer.init(params),
                           step=jnp.zeros((), jnp.int32))
        dev_batch = jax.device_put(batch)
        key = jax.random.PRNGKey(0)

        state, loss = step(state, dev_batch, key)  # compile
        float(np.asarray(loss))
        reps = REPS
        t0 = time.perf_counter()
        for _ in range(reps):
            state, loss = step(state, dev_batch, key)
        float(np.asarray(loss))
        per_step = (time.perf_counter() - t0) / reps
        tag = "f32" if dtype == "float32" else "bf16"
        results[f"train_step_ms_{tag}"] = round(1e3 * per_step, 3)
        results[f"train_samples_per_sec_{tag}"] = round(BATCH / per_step, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
