"""RestorationService throughput/latency on the current default device.

Measures the production serving surface end to end — request queue,
batch aggregation, padding, device program, future resolution — for the
policy (DT-guided) and mcts (device-resident tree search) modes.

Run on TPU:  python benchmarks/serving_bench.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.models.arniqa import proxy_value_fn_jax
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.serving import (
        RestorationRequest, RestorationService)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    results = {"platform": jax.devices()[0].platform}

    den_params = convert_unet_state_dict(random_unet_state_dict(0))
    den_model = UNetDenoiser()
    denoise = lambda img, sig: den_model.apply({"params": den_params},
                                               img, sig)
    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        dt_params = jax.device_get(init_dt_params(cfg, seed=0))
    dt_apply = make_dt_apply(cfg)

    def requests(n):
        return [RestorationRequest(mat=make_mat_record(seed=i), rtg=0.6,
                                   task=2) for i in range(n)]

    # --- policy mode -----------------------------------------------------
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="policy",
                             batch_size=16, max_timesteps=30)
    try:
        svc.restore(requests(16))  # compile + warm
        t0 = time.perf_counter()
        svc.restore(requests(64))
        wall = time.perf_counter() - t0
        results["serving_policy_requests_per_sec"] = round(64 / wall, 2)
        t0 = time.perf_counter()
        svc.restore(requests(1))  # single-request latency (padded batch)
        results["serving_policy_single_latency_ms"] = round(
            1e3 * (time.perf_counter() - t0), 1)
    finally:
        svc.close()

    # --- mcts mode (device-resident search per batch) --------------------
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="mcts",
                             batch_size=8, max_timesteps=30,
                             search_cfg=MCTSConfig(iterations=30),
                             value_fn_jax=proxy_value_fn_jax)
    try:
        svc.restore(requests(8))  # compile + warm
        t0 = time.perf_counter()
        svc.restore(requests(16))
        wall = time.perf_counter() - t0
        results["serving_mcts_requests_per_sec"] = round(16 / wall, 2)
    finally:
        svc.close()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
