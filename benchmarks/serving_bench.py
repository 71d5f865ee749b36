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

POLICY_BATCH = 16      # compiled service batch shape (policy mode)
POLICY_LOAD = 64       # requests in the throughput burst
N_CLIENTS = 32         # concurrent clients (percentile section):
                       # 2x the batch shape, so the queue SATURATES —
                       # the round-4 tail regime (VERDICT r4 #5)
REQS_PER_CLIENT = 8
MCTS_BATCH = 8
MAX_TIMESTEPS = 30
MCTS_ITERATIONS = 30
IMAGE_SIZE = 128


def main() -> None:
    import jax
    # --cpu = tunnel-free control / smoke path (the suite's conftest does
    # the same; env vars alone are too late, CLAUDE.md). Without it, a
    # dead TPU probe (tunnel outage) also falls back instead of hanging.
    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

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

    results = {"platform": jax.devices()[0].platform,
               "tpu_unreachable": tpu_unreachable}

    t_start = time.perf_counter()

    def _mark(section):
        # Live progress on stderr: a mid-run tunnel hang (observed
        # 2026-08-20: first device fetch blocked 20+ min with ~0 CPU)
        # is otherwise indistinguishable from a long compile.
        dt = time.perf_counter() - t_start
        print(f"[serving-bench] {section} ({dt:.0f}s)",
              file=sys.stderr, flush=True)

    den_params = convert_unet_state_dict(random_unet_state_dict(0))
    den_model = UNetDenoiser()
    denoise = lambda img, sig: den_model.apply({"params": den_params},
                                               img, sig)
    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        dt_params = jax.device_get(init_dt_params(cfg, seed=0))
    dt_apply = make_dt_apply(cfg)

    def requests(n):
        return [RestorationRequest(
            mat=make_mat_record(size=IMAGE_SIZE, seed=i), rtg=0.6,
            task=2) for i in range(n)]

    # --- policy mode -----------------------------------------------------
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="policy",
                             batch_size=POLICY_BATCH,
                             max_timesteps=MAX_TIMESTEPS)
    try:
        _mark("policy compile+warm")
        svc.restore(requests(POLICY_BATCH))  # compile + warm
        _mark("policy sequential load")
        t0 = time.perf_counter()
        svc.restore(requests(POLICY_LOAD))
        wall = time.perf_counter() - t0
        results["serving_policy_requests_per_sec"] = round(
            POLICY_LOAD / wall, 2)
        t0 = time.perf_counter()
        svc.restore(requests(1))  # single-request latency (padded batch)
        results["serving_policy_single_latency_ms"] = round(
            1e3 * (time.perf_counter() - t0), 1)

        # Concurrent independent clients (the production shape):
        # N_CLIENTS client threads x REQS_PER_CLIENT sequential
        # single-slice requests each, per-request wall from submit to
        # Future resolution — exercises queue contention + batch
        # aggregation under load and reports tail latency, not just the
        # solo round trip.
        import threading

        def concurrent_percentiles(service):
            reqs = requests(N_CLIENTS)
            lat_ms = []
            lat_lock = threading.Lock()

            def client(k):
                for _ in range(REQS_PER_CLIENT):
                    t0 = time.perf_counter()
                    service.submit(reqs[k]).result()
                    dt = 1e3 * (time.perf_counter() - t0)
                    with lat_lock:
                        lat_ms.append(dt)

            threads = [threading.Thread(target=client, args=(k,))
                       for k in range(N_CLIENTS)]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            p50, p95, p99 = np.percentile(lat_ms, [50, 95, 99])
            return (round(float(p50), 1), round(float(p95), 1),
                    round(float(p99), 1),
                    round(len(lat_ms) / wall, 2))

        _mark("concurrent clients (adaptive fill window)")
        st0 = svc.stats()
        p50, p95, p99, rps = concurrent_percentiles(svc)
        st1 = svc.stats()
        results["serving_policy_concurrent_batches"] = (
            st1["batches"] - st0["batches"])
        results["serving_policy_concurrent_padded_slots"] = (
            st1["padded_slots"] - st0["padded_slots"])
        results["serving_policy_concurrent_p50_ms"] = p50
        results["serving_policy_concurrent_p95_ms"] = p95
        results["serving_policy_concurrent_p99_ms"] = p99
        results["serving_policy_concurrent_requests_per_sec"] = rps
        results["serving_policy_concurrent_p95_over_p50"] = round(
            p95 / p50, 2) if p50 else None
    finally:
        svc.close()

    # --- legacy-batcher A/B (fill_window_frac=0) ---------------------------
    # Same concurrent-clients section with the adaptive fill window
    # disabled: the round-4 configuration whose per-item 10 ms patience
    # split the client cohort into partial batches (p95 ~= p99 ~= 6x p50,
    # RESULTS.md). Reported so the tail fix is a same-run A/B, not a
    # cross-day comparison.
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="policy",
                             batch_size=POLICY_BATCH,
                             max_timesteps=MAX_TIMESTEPS,
                             fill_window_frac=0.0)
    try:
        _mark("concurrent clients (legacy fixed patience)")
        svc.restore(requests(POLICY_BATCH))  # warm (program cache shared)
        st0 = svc.stats()
        p50, p95, p99, rps = concurrent_percentiles(svc)
        st1 = svc.stats()
        results["serving_policy_legacy_concurrent_batches"] = (
            st1["batches"] - st0["batches"])
        results["serving_policy_legacy_concurrent_padded_slots"] = (
            st1["padded_slots"] - st0["padded_slots"])
        results["serving_policy_legacy_concurrent_p50_ms"] = p50
        results["serving_policy_legacy_concurrent_p95_ms"] = p95
        results["serving_policy_legacy_concurrent_p99_ms"] = p99
        results["serving_policy_legacy_concurrent_requests_per_sec"] = rps
    finally:
        svc.close()

    # --- pipelined dispatch A/B (policy mode) ------------------------------
    # pipeline_depth=2: batch N+1 assembles+dispatches while batch N's
    # fetch is in flight — the sustained-load shape where the fetch round
    # trip leaves the steady-state path.
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="policy",
                             batch_size=POLICY_BATCH,
                             max_timesteps=MAX_TIMESTEPS,
                             pipeline_depth=2)
    try:
        _mark("pipelined dispatch")
        svc.restore(requests(POLICY_BATCH))  # compile + warm
        t0 = time.perf_counter()
        svc.restore(requests(POLICY_LOAD))
        wall = time.perf_counter() - t0
        results["serving_policy_pipelined_requests_per_sec"] = round(
            POLICY_LOAD / wall, 2)
        st = svc.stats()  # service-side observability counters
        results["serving_policy_padded_slot_pct"] = round(
            100.0 * st["padded_slots"]
            / (st["batches"] * svc.batch_size), 1)
        results["serving_policy_latency_mean_ms"] = round(
            st["latency_mean_ms"], 1)
        results["serving_policy_latency_max_ms"] = round(
            st["latency_max_ms"], 1)
    finally:
        svc.close()

    # --- mcts mode (device-resident search per batch) --------------------
    svc = RestorationService(denoise=denoise, cfg=cfg, dt_apply=dt_apply,
                             dt_params=dt_params, mode="mcts",
                             batch_size=MCTS_BATCH,
                             max_timesteps=MAX_TIMESTEPS,
                             search_cfg=MCTSConfig(iterations=MCTS_ITERATIONS),
                             value_fn_jax=proxy_value_fn_jax)
    try:
        _mark("mcts mode compile+warm")
        svc.restore(requests(MCTS_BATCH))  # compile + warm
        _mark("mcts load")
        t0 = time.perf_counter()
        svc.restore(requests(2 * MCTS_BATCH))
        wall = time.perf_counter() - t0
        results["serving_mcts_requests_per_sec"] = round(
            2 * MCTS_BATCH / wall, 2)
    finally:
        svc.close()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
