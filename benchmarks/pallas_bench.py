"""Pallas-vs-XLA micro/macro benchmarks on the current default device.

Run on TPU:  python benchmarks/pallas_bench.py
Reports per-variant timings (pipelined dispatch, scalar fetch) and PSNR
agreement for the full rollout, as one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _throughput(fn, fetch, repeats: int = 20, warmup: int = 2) -> float:
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.config import ModelConfig
    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.env import (
        compute_reward, fixed_param_rollout, reset_from_mat)
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    rng = np.random.default_rng(0)
    results = {"platform": jax.devices()[0].platform,
               "tpu_unreachable": tpu_unreachable}
    fetch0 = lambda o: float(np.asarray(o).reshape(-1)[0])

    # --- full ADMM rollout, XLA vs fused-pallas k-space consistency ------
    params = convert_unet_state_dict(random_unet_state_dict(0))
    model = UNetDenoiser()
    den = lambda img, sig: model.apply({"params": params}, img, sig)
    mats = [make_mat_record(seed=s) for s in range(8)]
    state = reset_from_mat(
        {k: np.concatenate([m[k] for m in mats]) for k in mats[0]})

    for tag, flag in (("xla", False), ("pallas", True)):
        roll = jax.jit(lambda s, f=flag: compute_reward(
            fixed_param_rollout(den, s, 0.5, 15 / 255.0, 30,
                                use_pallas=f)[0]))
        dt = _throughput(lambda: roll(state), fetch0, repeats=10)
        results[f"admm_rollout_{tag}_ms"] = round(1e3 * dt, 3)
        results[f"admm_rollout_{tag}_psnr"] = round(fetch0(roll(state)), 4)

    # --- DT forward, XLA vs pallas attention+layernorm -------------------
    b, t = 16, 6
    inputs = (
        jnp.asarray(rng.uniform(0, 1, (b, t, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, t, 128 * 128)), jnp.float32),
        jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :, None],
                         (b, t, 1)),
        jnp.asarray(rng.integers(0, 9, (b, t)), jnp.int32),
        jnp.asarray(rng.uniform(0, 1, (b, t, 3)), jnp.float32),
    )
    dt_params = init_dt_params(ModelConfig(block_size=18, n_embeds=9),
                               seed=0)
    for tag, flag in (("xla", False), ("pallas", True)):
        cfg = ModelConfig(block_size=18, n_embeds=9, use_pallas=flag)
        apply_fn = jax.jit(
            lambda p, *a, c=cfg: make_dt_apply(c)(p, *a).pred_actions)
        dt = _throughput(lambda: apply_fn(dt_params, *inputs), fetch0,
                         repeats=20)
        results[f"dt_forward_{tag}_ms"] = round(1e3 * dt, 3)
        results[f"dt_forward_{tag}_a0"] = round(
            fetch0(apply_fn(dt_params, *inputs)), 6)

    # Single-kernel whole-transformer decode (ops/pallas/transformer.py).
    from dt4image_restoration_tpu.models.decision_transformer import (
        make_fused_dt_apply)
    cfg0 = ModelConfig(block_size=18, n_embeds=9)
    fused_fn = jax.jit(
        lambda p, *a: make_fused_dt_apply(cfg0)(p, *a).pred_actions)
    dt = _throughput(lambda: fused_fn(dt_params, *inputs), fetch0,
                     repeats=20)
    results["dt_forward_fused_kernel_ms"] = round(1e3 * dt, 3)
    results["dt_forward_fused_kernel_a0"] = round(
        fetch0(fused_fn(dt_params, *inputs)), 6)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
